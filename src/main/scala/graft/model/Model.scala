package graft.model

import java.sql.Timestamp

/** One conversation turn — the engine's "document"
  * (BASELINE.json input_hint schema; a doc = (conv_id, turn_idx), the analog
  * of the reference's file path, reference: app/LocalIndex/localindex.h:19). */
final case class Turn(
    conv_id: String,
    turn_idx: Int,
    role: String,
    text: String,
    tool: String,
    ts: Timestamp)

/** Stable document identity. */
final case class DocKey(conv_id: String, turn_idx: Int)

/** A doc with its dense 64-bit id (the analog of the reference's 1-based
  * path IDs, app/Index/Index_Add.cpp:59-66 — ours are 0-based longs assigned
  * in (conv_id, turn_idx) order; merges append fresh ids like the
  * reference's M2, app/Index/Index_Merge.cpp:655-737). */
final case class DocRow(doc_id: Long, conv_id: String, turn_idx: Int)

/** Per-doc stats: word_count = distinct terms (reference parity,
  * app/LocalIndex/LocalIndex.cpp:72-73), dl = total tokens (BM25). */
final case class DocStats(doc_id: Long, word_count: Int, dl: Int)

/** One exploded tokenized row heading into the term shuffle. */
final case class TermPosting(term: String, doc_id: Long, tf: Int, dl: Int)

/** One posting-list part row as persisted. A term's postings are split into
  * doc-range-delimited parts (salting/splitting for hot terms,
  * SURVEY.md §7.6.3); `part` orders them, `first_doc`/`last_doc` delimit,
  * `bytes` is the delta+varint block-compressed payload ([[graft.index.Codec]]). */
final case class PostingPart(
    letter: String,
    term: String,
    part: Int,
    first_doc: Long,
    last_doc: Long,
    df: Long,
    max_tf: Int,
    bytes: Array[Byte])

/** Dictionary row (the analog of words.index + words_f jump table —
  * letter partition column + parquet min/max stats give the pruning,
  * SURVEY.md §4.1). */
final case class DictEntry(letter: String, term: String, df: Long, parts: Int)

/** Search result in count-parity mode (reference's (path, count) output,
  * app/Search/Search.cpp:360-371). */
final case class CountedDoc(conv_id: String, turn_idx: Int, cnt: Long)

/** Search result in BM25 mode. */
final case class ScoredDoc(conv_id: String, turn_idx: Int, score: Double)

/** Engine configuration. */
final case class EngineConf(
    /** BM25 k1 (north star: 1.2). */
    k1: Double = 1.2,
    /** BM25 b (north star: 0.75). */
    b: Double = 0.75,
    /** Reference `config_min_char_for_match` (app/Search/Search.cpp:16):
      * wildcard terms match only when length > minCharForMatch. */
    minCharForMatch: Int = 4,
    /** Reference `config_exact_match`: force all query terms exact. */
    exactMatch: Boolean = false,
    /** Target max postings per stored part row. Hot terms (df above this)
      * are salted across doc-range cells of ~this size, which bounds both
      * the encode-time reducer keys (skew: one hot term becomes many evenly
      * sized keys, SURVEY.md §7.6.3) and the unit of WAND doc-range
      * sharding. 64k postings ≈ 150-300 KB compressed — small enough that
      * a single straggler key never serializes a stage, large enough that
      * per-part overhead is noise. */
    maxPostingsPerPart: Int = 1 << 16,
    /** Postings per compressed block (block-max WAND granularity). */
    blockSize: Int = 128,
    /** Shuffle partitions for index-build jobs; None = session default. */
    shufflePartitions: Option[Int] = None,
    /** Layer-chain bound: each merge adds one snapshot layer; when a
      * merge leaves this many, a squash compaction runs automatically
      * (result-identical) so read amplification stays O(1) over an
      * unbounded merge sequence — LSM compaction, applied by BOTH the
      * streaming micro-batch path and the batch CLI path. */
    maxLayers: Int = 8)

object EngineConf { val default: EngineConf = EngineConf() }
