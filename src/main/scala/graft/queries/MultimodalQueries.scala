package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.multimodal.MultimodalOps
import graft.sources.Tables

/** Multimodal-column queries over binary payloads + typed metadata.
  *
  * m1/m3 exercise the opaque-binary plumbing (schema, hashing, chunking —
  * no decode claimed; their oracles work because the corpus text is ASCII,
  * so byte-level ops equal char-level SQL on the text). m2/m4/m5 go through
  * REAL decoders (`javax.imageio`, `javax.sound.sampled`): payloads are
  * genuine PNG/WAV/frame-container bytes whose decoded content follows a
  * closed-form seed formula (MediaGen), which the DuckDB oracle mirrors —
  * a hash match proves the encode→decode roundtrip is faithful.
  */
object MultimodalQueries {

  /** Metadata + content hash straight off the binary column (no decode). */
  def m1MediaMeta(spark: SparkSession, dir: String): DataFrame =
    MultimodalOps.attachMedia(Tables.documents(spark, dir))
      .select(
        col("doc_id"),
        col("meta.format").as("format"),
        col("meta.width").as("width"),
        col("meta.height").as("height"),
        length(col("media")).cast("long").as("n_bytes"),
        md5(col("media")).as("content_md5"))
      .orderBy("doc_id")

  val m1Oracle: String =
    """SELECT doc_id,
      |       CASE doc_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'wav' ELSE 'mp4' END AS format,
      |       CAST(doc_id % 640 + 1 AS INTEGER) AS width,
      |       CAST(doc_id % 480 + 1 AS INTEGER) AS height,
      |       octet_length(encode(text)) AS n_bytes,
      |       md5(text) AS content_md5
      |FROM documents ORDER BY doc_id""".stripMargin

  /** m2: REAL image decode — each doc carries a genuine PNG (MediaGen
    * fixture), decoded per-partition with `javax.imageio`; features
    * (luminance sum/min/max, row-major pixel fingerprint, 4×4 nearest-
    * neighbor thumbnail fingerprint) are computed from the DECODED pixels
    * only. The oracle computes the same integers from the seed formula —
    * it never sees the PNG bytes, so a match certifies the decode path.
    */
  def m2DecodeFeatures(spark: SparkSession, dir: String): DataFrame = {
    val imgs = MultimodalOps.syntheticImages(spark, Tables.documents(spark, dir))
    MultimodalOps.decodeImageFeatures(spark, imgs)
      .toDF()
      .orderBy("doc_id")
  }

  val m2Oracle: String =
    """WITH d AS (SELECT doc_id, doc_id % 24 + 8 AS w, doc_id % 16 + 8 AS h FROM documents),
      |px AS (
      |  SELECT d.doc_id, d.w, d.h, x.i AS x, y.i AS y,
      |         (d.doc_id * 7 + x.i * 3 + y.i * 5) % 256 AS p
      |  FROM d, unnest(range(0, d.w)) AS x(i), unnest(range(0, d.h)) AS y(i)),
      |agg AS (
      |  SELECT doc_id, CAST(max(w) AS INTEGER) AS width, CAST(max(h) AS INTEGER) AS height,
      |         CAST(sum(p) AS BIGINT) AS lum_sum,
      |         CAST(min(p) AS INTEGER) AS lum_min, CAST(max(p) AS INTEGER) AS lum_max,
      |         CAST(sum(p * (y * w + x + 1)) AS BIGINT) AS px_fp
      |  FROM px GROUP BY doc_id),
      |th AS (
      |  SELECT d.doc_id,
      |         CAST(sum(((d.doc_id * 7 + ((i.i * d.w) // 4) * 3 + ((j.i * d.h) // 4) * 5) % 256)
      |                  * (j.i * 4 + i.i + 1)) AS BIGINT) AS thumb_fp
      |  FROM d, unnest(range(0, 4)) AS i(i), unnest(range(0, 4)) AS j(i)
      |  GROUP BY d.doc_id)
      |SELECT a.doc_id, a.width, a.height, a.lum_sum, a.lum_min, a.lum_max, a.px_fp, t.thumb_fp
      |FROM agg a JOIN th t ON a.doc_id = t.doc_id ORDER BY a.doc_id""".stripMargin

  /** m3: frame-sample explosion — one output row per sampled "frame"
    * (every 2nd 256-byte chunk), the row-expansion shape video pipelines
    * need (frames ≫ videos, so the explode must happen executor-side and
    * repartition freely afterwards — never a driver loop). Pure codegen'd
    * expressions: sequence → transform(substring) → posexplode.
    */
  def m3FrameSample(spark: SparkSession, dir: String): DataFrame =
    MultimodalOps.attachMedia(Tables.documents(spark, dir))
      .where(length(col("media")) > 0)
      .select(col("doc_id"),
        posexplode(expr(
          "transform(sequence(0, cast((length(media) - 1) / 256 as int)), i -> substring(media, i * 256 + 1, 256))")))
      .where(col("pos") % 2 === 0)
      .select(
        col("doc_id"),
        col("pos").as("frame_idx"),
        length(col("col")).cast("long").as("frame_bytes"),
        md5(col("col")).as("frame_md5"))
      .orderBy("doc_id", "frame_idx")

  val m3Oracle: String =
    """SELECT doc_id, CAST(f.i AS INTEGER) AS frame_idx,
      |       octet_length(encode(substr(text, CAST(f.i AS INTEGER) * 256 + 1, 256))) AS frame_bytes,
      |       md5(substr(text, CAST(f.i AS INTEGER) * 256 + 1, 256)) AS frame_md5
      |FROM documents, unnest(range(0, (octet_length(encode(text)) + 255) // 256)) AS f(i)
      |WHERE octet_length(encode(text)) > 0 AND f.i % 2 = 0
      |ORDER BY doc_id, frame_idx""".stripMargin

  /** m4: cross-media duplicate frames — the multimodal dedup shape (shared
    * intros/stock footage across videos). Each doc is a REAL container of
    * PNG frames; documents in the same `doc_id % 50` cohort share frame
    * content, so the duplicate set is non-trivial. The pipeline splits the
    * container, genuinely decodes every frame with `javax.imageio`, and
    * fingerprints its pixels — then ONE shuffle on the fingerprint; at
    * 100 TB this is exactly exact-dedup (d1) with frames as the unit
    * instead of docs. The oracle derives fingerprints from the seed
    * formula, never touching the PNG bytes.
    */
  def m4FrameDedup(spark: SparkSession, dir: String): DataFrame = {
    val vids = MultimodalOps.syntheticVideos(spark, Tables.documents(spark, dir))
    MultimodalOps.decodedFrameFingerprints(spark, vids)
      .toDF()
      .groupBy("frame_fp")
      .agg(countDistinct(col("doc_id")).as("n_docs"), min("doc_id").as("first_doc"))
      .where(col("n_docs") >= 2)
      .orderBy("frame_fp")
  }

  val m4Oracle: String =
    """WITH df AS (
      |  SELECT doc_id, (doc_id % 50) * 1000 + fr.i AS seed
      |  FROM documents, unnest(range(0, doc_id % 4 + 2)) AS fr(i)),
      |fp AS (
      |  SELECT s.seed,
      |         CAST(sum(((s.seed * 7 + x.i * 3 + y.i * 5) % 256) * (y.i * 16 + x.i + 1)) AS BIGINT) AS frame_fp
      |  FROM (SELECT DISTINCT seed FROM df) s, unnest(range(0, 16)) AS x(i), unnest(range(0, 12)) AS y(i)
      |  GROUP BY s.seed)
      |SELECT f.frame_fp, CAST(count(DISTINCT d.doc_id) AS BIGINT) AS n_docs, min(d.doc_id) AS first_doc
      |FROM df d JOIN fp f ON d.seed = f.seed
      |GROUP BY 1 HAVING count(DISTINCT d.doc_id) >= 2 ORDER BY frame_fp""".stripMargin

  /** m5: REAL audio decode — each doc carries a genuine RIFF/WAVE file,
    * parsed per-partition with `javax.sound.sampled`; amplitude features
    * come from the DECODED PCM samples only, the oracle from the seed
    * formula.
    */
  def m5AudioDecode(spark: SparkSession, dir: String): DataFrame = {
    val wavs = MultimodalOps.syntheticAudio(spark, Tables.documents(spark, dir))
    MultimodalOps.decodeAudioFeatures(spark, wavs)
      .toDF()
      .orderBy("doc_id")
  }

  val m5Oracle: String =
    """WITH d AS (SELECT doc_id, doc_id % 500 + 100 AS n FROM documents),
      |s AS (SELECT doc_id, n, i.i AS i, (doc_id * 11 + i.i * 17) % 256 AS v
      |      FROM d, unnest(range(0, d.n)) AS i(i))
      |SELECT doc_id, CAST(max(n) AS BIGINT) AS n_samples, CAST(sum(v) AS BIGINT) AS amp_sum,
      |       CAST(min(v) AS INTEGER) AS amp_min, CAST(max(v) AS INTEGER) AS amp_max,
      |       CAST(sum(v * (i + 1)) AS BIGINT) AS amp_fp
      |FROM s GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** m6: perceptual image dedup — decode every PNG, compute the 64-bit
    * dHash (9×8 nearest-neighbor grid, bit = right neighbor brighter),
    * and group by hash. The fixture gives cohorts (`doc_id % 50`) the
    * SAME texture with a uniform +0/+1 brightness edit per half of the
    * corpus: the exact pixel fingerprint (m4's unit, emitted as `px_fp`)
    * splits each cohort in two, the perceptual hash reunites it — the
    * re-encode/slight-edit near-dup exact hashing cannot catch. The
    * oracle replays the texture formula, never decoding: brightness
    * cancels in its comparisons exactly as it does in the decoded ones.
    *
    * Scale shape: one decode flatMap + one dhash-keyed window shuffle —
    * d1 with dHash as the unit. Hamming≤k grouping at corpus scale is
    * d5's 4×16 banding applied to this column (the hash is
    * simhash-shaped by construction).
    */
  def m6PerceptualDedup(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val imgs = MultimodalOps.syntheticTexturedImages(spark, Tables.documents(spark, dir))
    val w = Window.partitionBy("dhash")
    MultimodalOps.decodeDHash(spark, imgs)
      .toDF()
      .select(col("doc_id"), col("dhash"), col("px_fp"),
        min("doc_id").over(w).as("dup_of"),
        count(lit(1)).over(w).as("n_same_hash"))
      .orderBy("doc_id")
  }

  val m6Oracle: String =
    """WITH d AS (
      |  SELECT doc_id, doc_id % 50 AS seed, (doc_id // 50) % 2 AS pert FROM documents),
      |db AS (
      |  SELECT d.doc_id,
      |         CAST(sum(CASE WHEN ((seed * 2654435761 + (((x.i + 1) * 24) // 9) * (((x.i + 1) * 24) // 9) * 40503
      |                              + ((y.i * 16) // 8) * ((y.i * 16) // 8) * 9973
      |                              + (((x.i + 1) * 24) // 9) * ((y.i * 16) // 8) * 7919
      |                              + seed * (((x.i + 1) * 24) // 9) * 12007 + seed * ((y.i * 16) // 8) * 3571) % 255)
      |                         > ((seed * 2654435761 + ((x.i * 24) // 9) * ((x.i * 24) // 9) * 40503
      |                              + ((y.i * 16) // 8) * ((y.i * 16) // 8) * 9973
      |                              + ((x.i * 24) // 9) * ((y.i * 16) // 8) * 7919
      |                              + seed * ((x.i * 24) // 9) * 12007 + seed * ((y.i * 16) // 8) * 3571) % 255)
      |                  THEN CASE WHEN y.i * 8 + x.i = 63 THEN -9223372036854775808
      |                            ELSE 1::BIGINT << (y.i * 8 + x.i) END
      |                  ELSE 0 END) AS BIGINT) AS dhash
      |  FROM d, unnest(range(0, 8)) AS x(i), unnest(range(0, 8)) AS y(i)
      |  GROUP BY d.doc_id),
      |pf AS (
      |  SELECT d.doc_id,
      |         CAST(sum(((seed * 2654435761 + x.i * x.i * 40503 + y.i * y.i * 9973 + x.i * y.i * 7919
      |                    + seed * x.i * 12007 + seed * y.i * 3571) % 255 + pert) * (y.i * 24 + x.i + 1)) AS BIGINT) AS px_fp
      |  FROM d, unnest(range(0, 24)) AS x(i), unnest(range(0, 16)) AS y(i)
      |  GROUP BY d.doc_id)
      |SELECT db.doc_id, dhash, px_fp,
      |       min(db.doc_id) OVER (PARTITION BY dhash) AS dup_of,
      |       count(*) OVER (PARTITION BY dhash) AS n_same_hash
      |FROM db JOIN pf USING (doc_id)
      |ORDER BY db.doc_id""".stripMargin

  /** m7: banded-hamming perceptual near-dup — m6's dHash column pushed
    * through d5's machinery: 4×16-bit bands (pigeonhole-complete for
    * hamming ≤ 3) → candidate equi-join → exact `bit_count(xor)` verify →
    * per-doc group representative. The fixture's third variant class
    * flips ONE sampled grid pixel, moving ≤2 dHash bits — an edit
    * exact-hash grouping (m6) misses and the band join must catch.
    *
    * Scale shape — HASH-LEVEL COLLAPSE (r15; the ×100 rotation caught the
    * doc-level band join timing out): a doc's group representative is
    * min(doc_id) over every doc whose hash lies within hamming ≤ 3 of its
    * own, which is a function of the HASH alone. So the candidate join
    * runs over DISTINCT hashes carrying their min-doc (one hash groupBy),
    * and docs join the per-hash verdict back at the end. Bit-identical
    * output (same-hash docs are each other's hamming-0 neighbors exactly
    * as before — the per-hash min-doc folds them), but the pair space is
    * bounded by HASH DIVERSITY, not corpus size: a re-crawl that clones
    * one image a million times adds one row to the band join. This is
    * d21's component-collapse move applied to the LSH candidate stage;
    * the oracle is unchanged because the semantics are.
    */
  def m7PhashNeardup(spark: SparkSession, dir: String): DataFrame = {
    val imgs = MultimodalOps.syntheticTexturedVariants(spark, Tables.documents(spark, dir))
    val hashed = MultimodalOps.decodeDHash(spark, imgs).toDF()
      .select("doc_id", "dhash")
    val perHash = hashed.groupBy("dhash").agg(min("doc_id").as("min_doc"))
    val bands = perHash
      .select(col("dhash"), col("min_doc"),
        explode(sequence(lit(0), lit(3))).as("band"))
      .withColumn("bkey", expr("(dhash >> (band * 16)) & 65535"))
    // distinct-hash pairs within hamming ≤ 3 (0 is impossible — the
    // hashes differ); a pair surfacing through several bands just feeds
    // the same min twice into the neighbor aggregate
    // MEASURED AND REJECTED (r18): a computeWide pin on (band, bkey) — the
    // d17-style fix the r17 verdict proposed for the two ~0.4 s serial
    // band-join stages — read 1.14x SLOWER on a same-JVM interleaved A/B.
    // The join input here is the per-HASH collapsed relation (bounded by
    // hash diversity, not corpus size), so the pinned shuffle-width task
    // wave costs more than the serial stages it replaces.
    val nb = bands.as("a").join(bands.as("b"), Seq("band", "bkey"))
      .where(col("a.dhash") =!= col("b.dhash"))
      .where(bit_count(col("a.dhash").bitwiseXOR(col("b.dhash"))) <= 3)
      .groupBy(col("a.dhash").as("dhash"))
      .agg(min(col("b.min_doc")).as("nb_min"))
    val gm = perHash.join(nb, Seq("dhash"), "left")
      .select(col("dhash"),
        least(col("min_doc"), coalesce(col("nb_min"), col("min_doc"))).as("group_min"))
    hashed.join(gm, Seq("dhash"))
      .select(col("doc_id"), col("group_min"))
      .orderBy("doc_id")
  }

  val m7Oracle: String =
    """WITH d AS (
      |  SELECT doc_id, doc_id % 50 AS seed, CAST((doc_id // 50) % 3 AS INT) AS variant
      |  FROM documents),
      |db AS (
      |  SELECT d.doc_id,
      |         CAST(sum(CASE WHEN
      |             (CASE WHEN variant = 2 AND (((x.i + 1) * 24) // 9) = 10 AND ((y.i * 16) // 8) = 6
      |                   THEN ((seed * 2654435761 + (((x.i + 1) * 24) // 9) * (((x.i + 1) * 24) // 9) * 40503
      |                          + ((y.i * 16) // 8) * ((y.i * 16) // 8) * 9973
      |                          + (((x.i + 1) * 24) // 9) * ((y.i * 16) // 8) * 7919
      |                          + seed * (((x.i + 1) * 24) // 9) * 12007 + seed * ((y.i * 16) // 8) * 3571) % 255 + 128) % 255
      |                   ELSE (seed * 2654435761 + (((x.i + 1) * 24) // 9) * (((x.i + 1) * 24) // 9) * 40503
      |                          + ((y.i * 16) // 8) * ((y.i * 16) // 8) * 9973
      |                          + (((x.i + 1) * 24) // 9) * ((y.i * 16) // 8) * 7919
      |                          + seed * (((x.i + 1) * 24) // 9) * 12007 + seed * ((y.i * 16) // 8) * 3571) % 255 END)
      |           > (CASE WHEN variant = 2 AND ((x.i * 24) // 9) = 10 AND ((y.i * 16) // 8) = 6
      |                   THEN ((seed * 2654435761 + ((x.i * 24) // 9) * ((x.i * 24) // 9) * 40503
      |                          + ((y.i * 16) // 8) * ((y.i * 16) // 8) * 9973
      |                          + ((x.i * 24) // 9) * ((y.i * 16) // 8) * 7919
      |                          + seed * ((x.i * 24) // 9) * 12007 + seed * ((y.i * 16) // 8) * 3571) % 255 + 128) % 255
      |                   ELSE (seed * 2654435761 + ((x.i * 24) // 9) * ((x.i * 24) // 9) * 40503
      |                          + ((y.i * 16) // 8) * ((y.i * 16) // 8) * 9973
      |                          + ((x.i * 24) // 9) * ((y.i * 16) // 8) * 7919
      |                          + seed * ((x.i * 24) // 9) * 12007 + seed * ((y.i * 16) // 8) * 3571) % 255 END)
      |           THEN CASE WHEN y.i * 8 + x.i = 63 THEN -9223372036854775808
      |                     ELSE 1::BIGINT << (y.i * 8 + x.i) END
      |           ELSE 0 END) AS BIGINT) AS dhash
      |  FROM d, unnest(range(0, 8)) AS x(i), unnest(range(0, 8)) AS y(i)
      |  GROUP BY d.doc_id),
      |bands AS (
      |  SELECT doc_id, dhash, band, (dhash >> (band * 16)) & 65535 AS bkey
      |  FROM db, unnest(range(0, 4)) AS r(band)),
      |pairs AS (
      |  SELECT DISTINCT a.doc_id da, b.doc_id db, a.dhash ha, b.dhash hb
      |  FROM bands a JOIN bands b ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id),
      |near AS (
      |  SELECT da, db FROM pairs WHERE bit_count(xor(ha, hb)) <= 3),
      |sym AS (SELECT da AS doc_id, db AS nb FROM near UNION ALL SELECT db, da FROM near)
      |SELECT d.doc_id, least(d.doc_id, coalesce(min(sym.nb), d.doc_id)) AS group_min
      |FROM db d LEFT JOIN sym ON sym.doc_id = d.doc_id
      |GROUP BY d.doc_id ORDER BY d.doc_id""".stripMargin

  /** m8: CROSS-MODAL asset dedup — the joint image+caption grouping a
    * multimodal corpus needs (the LAION-style rule: two records are the
    * same ASSET if their caption text matches exactly OR their images
    * are perceptually identical; either modality alone under-merges —
    * re-crawls keep the caption but re-encode the image, mirrored assets
    * keep the image under a rewritten caption). Corpus = documents plus
    * d1's re-crawl replicas (every 10th doc re-appears, same caption;
    * the texture formula gives the replica the SAME image, so both edge
    * kinds fire). Each modality contributes STAR edges (doc → min doc of
    * its md5(caption) / dHash group — linear in docs, never pairwise
    * cliques), and [[graft.operators.ConnectedComponents.alternatingStars]]
    * merges the two edge sets into asset components labeled by global
    * min id. The oracle replays both groupings closed-form (m6's dHash
    * formula, never decoding) + reachability — the hash match certifies
    * the cross-modal merge exactly.
    */
  def m8CrossModalDedup(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, dir).select("doc_id", "text")
    val corpus = docs.unionByName(
      docs.where(col("doc_id") % 10 === 0)
        .withColumn("doc_id", col("doc_id") + 1000000L))
    val textEdges = corpus.select(col("doc_id").as("a"),
      min("doc_id").over(
        Window.partitionBy(md5(graft.functions.Text.normText(col("text"))))).as("b"))
    val imgEdges = MultimodalOps.decodeDHash(spark,
        MultimodalOps.syntheticTexturedImages(spark, corpus)).toDF()
      .select(col("doc_id").as("a"),
        min("doc_id").over(Window.partitionBy("dhash")).as("b"))
    val labels = graft.operators.ConnectedComponents
      .alternatingStars(textEdges.unionByName(imgEdges))
    labels.join(labels.groupBy("comp").agg(count(lit(1)).as("asset_size")), "comp")
      .select(col("id").as("doc_id"), col("comp").as("asset_id"), col("asset_size"))
      .orderBy("doc_id")
  }

  val m8Oracle: String =
    """WITH RECURSIVE corpus AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 10 = 0),
      |d AS (SELECT doc_id, doc_id % 50 AS seed, (doc_id // 50) % 2 AS pert FROM corpus),
      |db AS (
      |  SELECT d.doc_id,
      |         CAST(sum(CASE WHEN ((seed * 2654435761 + (((x.i + 1) * 24) // 9) * (((x.i + 1) * 24) // 9) * 40503
      |                              + ((y.i * 16) // 8) * ((y.i * 16) // 8) * 9973
      |                              + (((x.i + 1) * 24) // 9) * ((y.i * 16) // 8) * 7919
      |                              + seed * (((x.i + 1) * 24) // 9) * 12007 + seed * ((y.i * 16) // 8) * 3571) % 255)
      |                         > ((seed * 2654435761 + ((x.i * 24) // 9) * ((x.i * 24) // 9) * 40503
      |                              + ((y.i * 16) // 8) * ((y.i * 16) // 8) * 9973
      |                              + ((x.i * 24) // 9) * ((y.i * 16) // 8) * 7919
      |                              + seed * ((x.i * 24) // 9) * 12007 + seed * ((y.i * 16) // 8) * 3571) % 255)
      |                  THEN CASE WHEN y.i * 8 + x.i = 63 THEN -9223372036854775808
      |                            ELSE 1::BIGINT << (y.i * 8 + x.i) END
      |                  ELSE 0 END) AS BIGINT) AS dhash
      |  FROM d, unnest(range(0, 8)) AS x(i), unnest(range(0, 8)) AS y(i)
      |  GROUP BY d.doc_id),
      |tg AS (SELECT doc_id,
      |              min(doc_id) OVER (PARTITION BY md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))) AS rep
      |       FROM corpus),
      |ig AS (SELECT doc_id, min(doc_id) OVER (PARTITION BY dhash) AS rep FROM db),
      |und AS (
      |  SELECT doc_id AS a, rep AS b FROM tg UNION SELECT rep, doc_id FROM tg
      |  UNION SELECT doc_id, rep FROM ig UNION SELECT rep, doc_id FROM ig),
      |reach(id, m) AS (
      |  SELECT DISTINCT a, a FROM und
      |  UNION
      |  SELECT r.id, u.b FROM reach r JOIN und u ON u.a = r.m),
      |comp AS (SELECT id AS doc_id, min(m) AS asset_id FROM reach GROUP BY 1),
      |csizes AS (SELECT asset_id, count(*) AS asset_size FROM comp GROUP BY 1)
      |SELECT c.doc_id, CAST(c.asset_id AS BIGINT) AS asset_id,
      |       CAST(s.asset_size AS BIGINT) AS asset_size
      |FROM comp c JOIN csizes s USING (asset_id)
      |ORDER BY doc_id""".stripMargin

  /** m9: keyframe / scene-cut extraction — the temporal segmentation a
    * video-corpus pipeline runs BEFORE frame dedup (keep one keyframe per
    * scene, drop the in-scene near-identical frames). Each m4 GIF is
    * REALLY decoded frame-by-frame IN ORDER; a frame is a keyframe when it
    * opens the video (frame 0) or when its luminance mass jumps ≥
    * [[SceneCutT]] against the previous frame. The fixture's seed formula
    * gives adjacent frames a smooth drift of exactly 1344 (192 px × the
    * +7 seed step) with larger mod-256 wrap jumps (2496–4544 measured) at
    * cohort-dependent positions, so both cut and non-cut transitions are
    * exercised; the oracle replays the same integers closed-form and never
    * decodes.
    *
    * Scale shape: executor-side frame expansion (flatMap over the
    * container, like m4) then ONE window shuffle keyed by video — the lag
    * partition is a single video's frames (bounded by container length,
    * never corpus-sized), and output is keyframes only, a fraction of the
    * frame count. At 100 TB this is the standard decode → per-video
    * window → filter cascade; no stage holds more than a partition of
    * decoded frames.
    */
  def m9SceneCuts(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val vids = MultimodalOps.syntheticVideos(spark, Tables.documents(spark, dir))
    val lum = MultimodalOps.decodedFrameLuma(spark, vids).toDF()
    val w = Window.partitionBy("doc_id").orderBy("frame_idx")
    lum.withColumn("delta", col("luma_sum") - lag("luma_sum", 1).over(w))
      .where(col("frame_idx") === 0 || abs(col("delta")) >= SceneCutT)
      .select(col("doc_id"), col("frame_idx"), col("luma_sum"),
        coalesce(col("delta"), lit(0L)).as("delta"))
      .orderBy("doc_id", "frame_idx")
  }

  /** Between the fixture's smooth drift (1344) and its wrap jumps (≥2496). */
  private val SceneCutT = 2000L

  val m9Oracle: String =
    s"""WITH df AS (
       |  SELECT doc_id, CAST(fr.i AS INTEGER) AS frame_idx,
       |         (doc_id % 50) * 1000 + fr.i AS seed
       |  FROM documents, unnest(range(0, doc_id % 4 + 2)) AS fr(i)),
       |lum AS (
       |  SELECT doc_id, frame_idx,
       |         CAST(sum((seed * 7 + x.i * 3 + y.i * 5) % 256) AS BIGINT) AS luma_sum
       |  FROM df, unnest(range(0, 16)) AS x(i), unnest(range(0, 12)) AS y(i)
       |  GROUP BY doc_id, frame_idx),
       |d AS (
       |  SELECT doc_id, frame_idx, luma_sum,
       |         luma_sum - lag(luma_sum) OVER (PARTITION BY doc_id ORDER BY frame_idx) AS delta
       |  FROM lum)
       |SELECT doc_id, frame_idx, luma_sum, CAST(coalesce(delta, 0) AS BIGINT) AS delta
       |FROM d WHERE frame_idx = 0 OR abs(delta) >= $SceneCutT
       |ORDER BY doc_id, frame_idx""".stripMargin

  /** m10: audio SILENCE SEGMENTATION — the voice-activity-detection
    * precursor an audio-corpus pipeline runs before transcription or
    * chunking (trim silence, split on pauses): each m5 WAV is REALLY
    * decoded and its maximal low-amplitude runs (|sample − 128| <
    * [[SilenceTol]], length ≥ [[SilenceMinLen]]) become segment rows.
    * The run scan lives inside the decode loop ([[graft.multimodal
    * .MultimodalOps.decodedSilenceSegments]]), so at 100 TB the
    * sample-rate-sized stream never materializes as rows — only the
    * sparse segments do. The oracle replays the PCM seed formula with the
    * gaps-and-islands idiom (i − row_number per doc), certifying run
    * boundaries, lengths, and ordering end-to-end through the real RIFF
    * decode.
    */
  def m10SilenceSegments(spark: SparkSession, dir: String): DataFrame = {
    val wavs = MultimodalOps.syntheticAudio(spark, Tables.documents(spark, dir))
    MultimodalOps.decodedSilenceSegments(spark, wavs, SilenceTol, SilenceMinLen)
      .toDF()
      .orderBy("doc_id", "seg_idx")
  }

  /** Fixture band: the 17-step PCM walk dwells < 32 around mid-scale for
    * runs of 2–4 samples, so every doc has segments and the min-length
    * gate is exercised on both sides.
    */
  private val SilenceTol = 32
  private val SilenceMinLen = 2

  val m10Oracle: String =
    s"""WITH d AS (SELECT doc_id, doc_id % 500 + 100 AS n FROM documents),
       |s AS (SELECT doc_id, i.i AS i, (doc_id * 11 + i.i * 17) % 256 AS v
       |      FROM d, unnest(range(0, d.n)) AS i(i)),
       |sil AS (SELECT doc_id, i FROM s WHERE abs(v - 128) < $SilenceTol),
       |g AS (SELECT doc_id, i, i - row_number() OVER (PARTITION BY doc_id ORDER BY i) AS grp
       |      FROM sil),
       |seg AS (SELECT doc_id, min(i) AS start_i, max(i) AS end_i, count(1) AS n_samples
       |        FROM g GROUP BY doc_id, grp HAVING count(1) >= $SilenceMinLen)
       |SELECT doc_id,
       |       CAST(row_number() OVER (PARTITION BY doc_id ORDER BY start_i) - 1 AS INTEGER) AS seg_idx,
       |       CAST(start_i AS BIGINT) AS start_i, CAST(end_i AS BIGINT) AS end_i,
       |       CAST(n_samples AS BIGINT) AS n_samples
       |FROM seg ORDER BY doc_id, seg_idx""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m10_silence_segments" -> (m10SilenceSegments _),
    "m9_scene_cuts" -> (m9SceneCuts _),
    "m8_crossmodal_dedup" -> (m8CrossModalDedup _),
    "m7_phash_neardup" -> (m7PhashNeardup _),
    "m6_perceptual_dedup" -> (m6PerceptualDedup _),
    "m1_media_meta" -> (m1MediaMeta _),
    "m2_decode_features" -> (m2DecodeFeatures _),
    "m3_frame_sample" -> (m3FrameSample _),
    "m4_frame_dedup" -> (m4FrameDedup _),
    "m5_audio_decode" -> (m5AudioDecode _))

  val oracles: Map[String, String] = Map(
    "m10_silence_segments" -> m10Oracle,
    "m9_scene_cuts" -> m9Oracle,
    "m8_crossmodal_dedup" -> m8Oracle,
    "m7_phash_neardup" -> m7Oracle,
    "m6_perceptual_dedup" -> m6Oracle,
    "m1_media_meta" -> m1Oracle,
    "m2_decode_features" -> m2Oracle,
    "m3_frame_sample" -> m3Oracle,
    "m4_frame_dedup" -> m4Oracle,
    "m5_audio_decode" -> m5Oracle)
}
