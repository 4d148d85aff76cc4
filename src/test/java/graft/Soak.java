package graft;

import java.lang.annotation.ElementType;
import java.lang.annotation.Inherited;
import java.lang.annotation.Retention;
import java.lang.annotation.RetentionPolicy;
import java.lang.annotation.Target;
import org.scalatest.TagAnnotation;

/**
 * Class-level ScalaTest tag for the long crash/chaos soak suites (tag name
 * "graft.Soak"). The default `sbt test` excludes them ("-l graft.Soak" in
 * build.sbt) so the gate run fits the driver's budget; run them with
 * `sbt soak` (alias for `testOnly * -- -n graft.Soak`). They stay part of
 * the release bar — the exclusion is scheduling, not retirement.
 */
@TagAnnotation
@Retention(RetentionPolicy.RUNTIME)
@Target({ElementType.METHOD, ElementType.TYPE})
@Inherited
public @interface Soak {}
