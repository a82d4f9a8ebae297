package graft

import org.scalatest.funsuite.AnyFunSuite

/** Golden checksums of the committed trained artifacts.
  *
  * Both the ENGINE and the ORACLE consume these files (the oracle via
  * VALUES-list interpolation), so a silent modification would flow
  * through BOTH sides of every gate and still hash-match — the one
  * corruption the correctness gate cannot see. Pinning the checksums
  * makes an artifact change a deliberate act: retrain, verify the
  * printed metrics, then update the checksum here alongside the new
  * file in the same commit.
  */
class ArtifactsSpec extends AnyFunSuite {

  private val Golden = Map(
    "/graft/sentiment-lr-v1.tsv" -> "23b645f101b5f6ecea36e6ce69bf3716",
    "/graft/embedding-svd-v1.tsv" -> "29305e2abbe8cac9c70fec47f8ced650",
    "/graft/bpe-merges-v1.tsv" -> "b466c7dd06e61e85ca6dae232c50cd05",
    "/graft/refiner-lr-v1.tsv" -> "72bafa960fed1256e6c921ce636552cd",
    "/graft/quality-lr-v1.tsv" -> "03c7eceb25891c96f17951b7bf412417")

  test("committed artifacts match their golden checksums") {
    Golden.foreach { case (res, want) =>
      val in = getClass.getResourceAsStream(res)
      assert(in != null, s"missing artifact $res")
      val bytes = in.readAllBytes(); in.close()
      val got = java.security.MessageDigest.getInstance("MD5")
        .digest(bytes).map("%02x".format(_)).mkString
      assert(got == want,
        s"$res checksum changed ($got) — if the retrain was deliberate, " +
          "update ArtifactsSpec in the same commit")
    }
  }
}
