package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Minimal property-test driver over raw ScalaCheck generators
  * (scalatestplus isn't in the offline dependency cache). Deterministic:
  * fixed seed sequence, 100 cases per property.
  */
trait PropSupport {
  def forAllGen[T](gen: Gen[T], cases: Int = 100)(check: T => Unit): Unit = {
    val params = Gen.Parameters.default
    (0 until cases).foreach { i =>
      gen.apply(params, Seed(i.toLong)).foreach { v =>
        try check(v)
        catch {
          case e: Throwable =>
            throw new AssertionError(s"property failed for case #$i: $v", e)
        }
      }
    }
  }
}
