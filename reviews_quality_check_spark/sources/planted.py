"""Planted positive rows for the strict-threshold duplicate/similarity
gates (VERDICT r2 "What's wrong" #2).

The driver-generated synthetic tables contain no exact-duplicate texts
and no embedding pairs above cos 0.9 at sf<=0.01, so `exact_dup_groups`,
`combined_similar_pairs` (reference tiers), and `embedding_near_dups`
were hash-green on EMPTY result sets — certifying the join shape but not
the arithmetic. These fixtures union a tiny deterministic set of planted
rows (negative ids, disjoint from every real id at any scale factor)
into those three queries so the driver certifies non-trivial rows:

- three exact-dup text groups, one of which only collapses under the
  normalize chain (lower + trim + whitespace-collapse, F1/F2) — so the
  gate now also certifies normalization, not just md5-equality;
- two long near-duplicate text pairs (>50 words, so the reference's
  short-exact-dup exclusion gate is exercised on its *pass* branch)
  paired with identical / slightly-perturbed embeddings, landing in
  tier1/tier2/tier3 of the reference elif chain (config.py:19-23);
- an identical embedding pair (cos exactly 1.0) plus perturbed pairs
  (~0.99, ~0.95) for the LSH near-dup gate.

Everything is emitted as plain literals on BOTH engines (pure-Python
deterministic construction, float32-safe 6dp values), so cross-engine
bit-identity is trivial: each engine parses the same decimal literal.
Reference anchors: analyzers/similarity.py:235 (exact key),
analyzers/similarity.py:264-269 (block pairing), configs/config.py:11-23
(thresholds/tiers).
"""

from __future__ import annotations

from functools import lru_cache

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EMB_DIM = 64

# ---------------------------------------------------------------------------
# documents: (doc_id BIGINT, text, lang, source, n_chars BIGINT)
# negative ids -> block_id floor(id/100) = -1 for ids -1..-100, disjoint
# from every real doc_id (real ids are >= 0 at every scale factor).
# ---------------------------------------------------------------------------

_LONG_A = (
    "the planted long review describes a sturdy keyboard with quiet keys "
    "and a steady metal frame that survives daily travel while the "
    "battery lasts a full week of heavy typing and the wireless link "
    "never drops even in a crowded office so the overall impression "
    "after two months of constant use remains clearly positive and the "
    "price still feels fair for what the device delivers every day"
)
# same sentence with a handful of word substitutions: high (not perfect)
# n-gram Jaccard against _LONG_A
_LONG_A2 = _LONG_A.replace("sturdy", "solid").replace("quiet", "silent").replace(
    "crowded", "busy"
)
_LONG_B = (
    "this planted medium review covers a compact speaker with warm sound "
    "and a simple charging dock that fits on a narrow shelf while the "
    "firmware updates arrive on schedule and the pairing works with "
    "three phones at once so the verdict after a season of parties "
    "stays mostly favorable although the bass gets muddy at top volume "
    "and the buttons feel loose compared to the first unit we owned"
)
_LONG_B2 = _LONG_B.replace("warm", "rich").replace("narrow", "small").replace(
    "muddy", "boomy"
).replace("loose", "wobbly").replace("season", "summer")

_SHORT_DUP = "planted short duplicate review alpha"
_WS_DUP_1 = "Planted Whitespace  Dup Beta"
_WS_DUP_2 = "  planted   whitespace dup beta "

# (doc_id, text) — ids -1..-5 also get embeddings (combined-similarity
# block -1); -6..-10 are text-only exact-dup groups.
_PLANTED_DOCS = (
    (-1, _LONG_A),
    (-2, _LONG_A),      # identical long text: exact fp match but NOT short
    (-3, _LONG_A2),     # near-dup of A
    (-4, _LONG_B),
    (-5, _LONG_B2),     # near-dup of B
    (-6, _SHORT_DUP),
    (-7, _SHORT_DUP),
    (-8, _SHORT_DUP),   # 3-member exact group
    (-9, _WS_DUP_1),
    (-10, _WS_DUP_2),   # collapses only under normalize chain
)


def planted_documents(spark: SparkSession) -> DataFrame:
    """Pure-JVM literal plan (explode of literal structs over range(1)):
    ``createDataFrame`` would build a Python-RDD-backed frame whose jobs
    spawn one Python worker per default-parallelism slice — measured
    ~5s per query on local[32] for 10 rows. This shape is a
    LocalTableScan-equivalent: zero Python workers, sub-ms."""
    rows = F.array(
        *[
            F.struct(
                F.lit(int(i)).cast("long").alias("doc_id"),
                F.lit(t).alias("text"),
                F.lit("en").alias("lang"),
                F.lit("planted").alias("source"),
                F.lit(len(t)).cast("long").alias("n_chars"),
            )
            for i, t in _PLANTED_DOCS
        ]
    )
    return spark.range(1).select(F.explode(rows).alias("r")).select("r.*")


def sql_planted_documents() -> str:
    """DuckDB VALUES subquery with the identical rows (texts contain no
    single quotes by construction)."""
    vals = ", ".join(
        f"({i}, '{t}', 'en', 'planted', {len(t)})" for i, t in _PLANTED_DOCS
    )
    return (
        "(SELECT * FROM (VALUES " + vals + ") "
        "v(doc_id, text, lang, source, n_chars))"
    )


# ---------------------------------------------------------------------------
# sanitize-stress rows: the corpus text is pure printable ASCII (verified
# across sf0.001/0.01/0.1), so the NFKD + ascii-ignore + char-map stages
# of the sanitize chain (reference utils/text_processing.py:7-55) were
# exercised only by pytest. These rows plant every interesting branch:
# the full _CHAR_MAP inventory, combining accents (NFKD strips to base),
# ligatures/superscripts (NFKD compatibility-decomposes), CJK + emoji
# (ascii-ignore drops), control chars + exotic whitespace (collapse).
# The DuckDB oracle carries the EXPECTED outputs as literals, computed at
# SQL-build time by the clean-room ported chain (oracle.reference
# .sanitize_text) — which pytest pins byte-identical to the Arrow UDF.
# ids -21..-28: disjoint from real ids (>= 0) and dup/similarity ids
# (-1..-10); these rows are unioned ONLY into sanitized_preview.
# ---------------------------------------------------------------------------

_PLANTED_SANITIZE = (
    (-21, "\u201ccurly\u201d \u2018quotes\u2019 \u2013 dashes \u2014 and\u2026 bullets \u2022 here"),
    # accents strip to base; \xdf has no NFKD decomposition -> dropped ("strae")
    (-22, "caf\xe9 na\xefve r\xe9sum\xe9 \xfcber stra\xdfe"),
    # ligatures fi/fl, vulgar fraction 1/2, superscript 2 (NFKD compat)
    (-23, "\ufb01ne \ufb02ight \xbd dose \xb2 power"),
    (-24, "non\xa0breaking\xa0space soft\xadhyphen zero\u200bwidth\ufeffmarks"),
    (-25, "tabs\tand\nnewlines\r\nand  runs   of spaces"),
    (-26, "\u65e5\u672c\u8a9e text \U0001f600 with emoji \u2212 minus"),
    (-27, "   leading and trailing   "),
    (-28, "plain ascii survives unchanged"),
)


def planted_sanitize_docs(spark: SparkSession) -> DataFrame:
    """(doc_id, text) unicode stress rows as a pure-JVM literal plan."""
    rows = F.array(
        *[
            F.struct(
                F.lit(int(i)).cast("long").alias("doc_id"),
                F.lit(t).alias("text"),
            )
            for i, t in _PLANTED_SANITIZE
        ]
    )
    return spark.range(1).select(F.explode(rows).alias("r")).select("r.*")


def sql_planted_sanitized() -> str:
    """DuckDB VALUES of (doc_id, sanitized) EXPECTED outputs for the
    stress rows, precomputed via the ported reference chain."""
    from reviews_quality_check_spark.oracle.reference import sanitize_text

    def esc(s: str) -> str:
        return s.replace("'", "''")

    vals = ", ".join(
        f"({i}, '{esc(sanitize_text(t))}')" for i, t in _PLANTED_SANITIZE
    )
    return "(SELECT * FROM (VALUES " + vals + ") v(doc_id, sanitized))"


# html extraction stress payloads: every branch of the extract chain the
# plain-ASCII corpus cannot reach — attribute-laden tags, tags spanning
# newlines, unicode needing CHAR_MAP/NFKD, unclosed tags, stray angle
# brackets, empty body, invalid UTF-8 bytes, superscript/fraction NFKD.
_PLANTED_HTML: list[tuple[int, bytes]] = [
    (-91, '<div class="x" data-a=1>Hello <b>world</b></div>'.encode()),
    (-92, b'<p\nstyle="a">A<br/>B</p>'),
    (-93, '<span>caf\u00e9 \u2013 \u00f1o \u201cq\u201d</span>'.encode("utf-8")),
    (-94, b"<unclosed tag never ends"),
    (-95, b"a > b < c"),
    (-96, b"<html><body></body></html>"),
    (-97, b"<p>ok\xff\xfe</p> tail"),
    (-98, "<td>x\u00b2 + \u2152</td>".encode("utf-8")),
]


def planted_html_docs(spark: SparkSession) -> DataFrame:
    """(doc_id, html) extraction stress rows as a pure-JVM literal plan."""
    rows = F.array(
        *[
            F.struct(
                F.lit(int(i)).cast("long").alias("doc_id"),
                F.lit(b).alias("html"),
            )
            for i, b in _PLANTED_HTML
        ]
    )
    return spark.range(1).select(F.explode(rows).alias("r")).select("r.*")


def sql_planted_extracted() -> str:
    """DuckDB VALUES of (doc_id, extracted) EXPECTED outputs for the
    stress payloads, precomputed via the clean-room extract chain."""
    from reviews_quality_check_spark.oracle.reference import extract_text

    def esc(s: str) -> str:
        return s.replace("'", "''")

    vals = ", ".join(
        f"({i}, '{esc(extract_text(b))}')" for i, b in _PLANTED_HTML
    )
    return "(SELECT * FROM (VALUES " + vals + ") v(doc_id, extracted))"


# ---------------------------------------------------------------------------
# embeddings: (vec_id BIGINT, embedding FLOAT[], label INTEGER)
# ---------------------------------------------------------------------------


def _md5_unit(salt: str, j: int) -> float:
    """Deterministic pseudo-random in [-1, 1), 6dp (exact in float32).
    Delegates to the single canonical construction (ann.md5_unit)."""
    from reviews_quality_check_spark.operators.ann import md5_unit

    return round(md5_unit(f"{salt}:{j}"), 6)


@lru_cache(maxsize=None)
def _planted_vecs() -> tuple:
    v1 = [_md5_unit("plantA", j) for j in range(EMB_DIM)]
    # small perturbation -> cos ~0.995 vs v1
    v1p = [round(x + (0.03 if j < 4 else 0.0), 6) for j, x in enumerate(v1)]
    v2 = [_md5_unit("plantB", j) for j in range(EMB_DIM)]
    # larger perturbation -> cos ~0.95 vs v2
    v2p = [round(x + (0.12 if j % 8 == 0 else 0.0), 6) for j, x in enumerate(v2)]
    # (vec_id, vector, label)
    return (
        (-1, v1, 9),
        (-2, v1, 9),    # identical pair: cos exactly 1.0
        (-3, v1p, 9),
        (-4, v2, 9),
        (-5, v2p, 9),
    )


def planted_embeddings(spark: SparkSession) -> DataFrame:
    """Pure-JVM literal plan — see planted_documents for why not
    createDataFrame."""
    rows = F.array(
        *[
            F.struct(
                F.lit(int(i)).cast("long").alias("vec_id"),
                F.array(*[F.lit(float(x)) for x in v])
                .cast("array<float>")
                .alias("embedding"),
                F.lit(int(lb)).cast("int").alias("label"),
            )
            for i, v, lb in _planted_vecs()
        ]
    )
    return spark.range(1).select(F.explode(rows).alias("r")).select("r.*")


def sql_planted_embeddings() -> str:
    def arr(v):
        return "[" + ", ".join(repr(x) for x in v) + "]::FLOAT[]"

    vals = ", ".join(
        f"({i}, {arr(v)}, {lb})" for i, v, lb in _planted_vecs()
    )
    return "(SELECT * FROM (VALUES " + vals + ") v(vec_id, embedding, label))"


# ---------------------------------------------------------------------------
# Gopher/C4 filter stress rows: the synthetic corpus never trips the
# brace / lorem-ipsum / symbol-ratio / mean-word-length rules, so three
# planted rows (ids -31..-33, disjoint from all other planted ranges)
# exercise the FALSE branch of each flag.
# ---------------------------------------------------------------------------

_PLANTED_GOPHER = (
    (-31, "{code block} with lorem ipsum inside and not much else here"),
    (-32, "### heading ... with ... many ... ellipses ... and ### tags ###"),
    (-33, ("supercalifragilisticexpialidocious " * 60).strip()),
)


def planted_gopher_docs(spark: SparkSession) -> DataFrame:
    rows = F.array(
        *[
            F.struct(
                F.lit(int(i)).cast("long").alias("doc_id"),
                F.lit(t).alias("text"),
            )
            for i, t in _PLANTED_GOPHER
        ]
    )
    return spark.range(1).select(F.explode(rows).alias("r")).select("r.*")


def sql_planted_gopher() -> str:
    vals = ", ".join(f"({i}, '{t}')" for i, t in _PLANTED_GOPHER)
    return "(SELECT * FROM (VALUES " + vals + ") v(doc_id, text))"


# ---------------------------------------------------------------------------
# PII stress rows (ids -41..-44): the synthetic corpus contains no
# emails/phones/IPs, so these exercise every redaction branch,
# including adjacency (email next to phone) and a non-PII digit run
# that must NOT be redacted as a phone (too short).
# ---------------------------------------------------------------------------

_PLANTED_PII = (
    (-41, "contact us at support@example.com or sales.team@sub.example.org today"),
    (-42, "call +1 (555) 123-4567 or 555-867-5309 for details"),
    (-43, "server at 192.168.0.1 and 10.0.0.255 responded; order 12345 shipped"),
    (-44, "mixed: a@b.co then +44 20 7946 0958 at 8.8.8.8 end"),
)


def planted_pii_docs(spark: SparkSession) -> DataFrame:
    rows = F.array(
        *[
            F.struct(
                F.lit(int(i)).cast("long").alias("doc_id"),
                F.lit(t).alias("text"),
            )
            for i, t in _PLANTED_PII
        ]
    )
    return spark.range(1).select(F.explode(rows).alias("r")).select("r.*")


def sql_planted_pii() -> str:
    vals = ", ".join(f"({i}, '{t}')" for i, t in _PLANTED_PII)
    return "(SELECT * FROM (VALUES " + vals + ") v(doc_id, text))"


# ---------------------------------------------------------------------------
# Repeated-line stress rows (ids -51..-56): the synthetic corpus has no
# cross-document repeated SENTENCES (verified: repeated_lines over the
# bare table flags 0 at every sf), so these plant every branch of the
# C4 line-dedup rule: a boilerplate line occurring 4x (>= 3 -> dropped)
# at head, middle, and tail positions of otherwise-unique docs; one doc
# that is ONLY the boilerplate line (cleaned text becomes empty); and a
# line occurring exactly twice (< 3 -> must be KEPT).
# ---------------------------------------------------------------------------

_BOILER_LINE = "planted boilerplate footer line repeated across pages"
_TWICE_LINE = "planted twice-only line appears here"

_PLANTED_LINES = (
    (-51, f"unique planted intro one. {_BOILER_LINE}. unique planted tail one."),
    (-52, f"{_BOILER_LINE}. unique planted middle two! another unique tail two."),
    (-53, f"unique planted intro three? {_BOILER_LINE}."),
    (-54, f"{_BOILER_LINE}."),
    (-55, f"{_TWICE_LINE}. unique planted tail five."),
    (-56, f"{_TWICE_LINE}. unique planted tail six."),
)


def planted_line_docs(spark: SparkSession) -> DataFrame:
    rows = F.array(
        *[
            F.struct(
                F.lit(int(i)).cast("long").alias("doc_id"),
                F.lit(t).alias("text"),
            )
            for i, t in _PLANTED_LINES
        ]
    )
    return spark.range(1).select(F.explode(rows).alias("r")).select("r.*")


def sql_planted_lines() -> str:
    vals = ", ".join(f"({i}, '{t}')" for i, t in _PLANTED_LINES)
    return "(SELECT * FROM (VALUES " + vals + ") v(doc_id, text))"


# ---------------------------------------------------------------------------
# Upsample stress rows (ids -61..-76): the synthetic corpus has near-
# equal per-source counts, so source_upsample's repeat factor is 1
# everywhere on the bare table (the replication branch never fires).
# Three planted sources exercise the live branches: a 1-doc and a 2-doc
# source (rep hits the least(4, ...) CAP), and a 13-doc source whose
# rep lands strictly between 1 and the cap at sf0.001/0.01
# ((25 + 12) // 13 = 2) and at the cap at sf0.1.
# ---------------------------------------------------------------------------

_PLANTED_UPSAMPLE = tuple(
    [(-61, "planted rare source a doc one", "planted_rare_a"),
     (-62, "planted rare source a doc two", "planted_rare_a"),
     (-63, "planted rare source b only doc", "planted_rare_b")]
    + [(-64 - j, f"planted mid source doc {j}", "planted_mid") for j in range(13)]
)


def planted_upsample_docs(spark: SparkSession) -> DataFrame:
    rows = F.array(
        *[
            F.struct(
                F.lit(int(i)).cast("long").alias("doc_id"),
                F.lit(t).alias("text"),
                F.lit(s).alias("source"),
            )
            for i, t, s in _PLANTED_UPSAMPLE
        ]
    )
    return spark.range(1).select(F.explode(rows).alias("r")).select("r.*")


def sql_planted_upsample() -> str:
    vals = ", ".join(f"({i}, '{t}', '{s}')" for i, t, s in _PLANTED_UPSAMPLE)
    return "(SELECT * FROM (VALUES " + vals + ") v(doc_id, text, source))"


# ---------------------------------------------------------------------------
# Clean-doc row (id -81): the synthetic corpus is single-line (sentence
# count 1), so the Gopher min_sentences rule fails on EVERY real doc
# and the composed cleaning_verdicts keep-conjunction would be
# vacuously false. This one planted doc passes every rule (59 words,
# mean word length 4.46, 5 stop-set hits, 3 sentences, max bigram
# frequency 2/58, no symbols/braces/lorem/PII) — the single keep=true
# positive that certifies the conjunction's true branch.
# ---------------------------------------------------------------------------

_PLANTED_CLEAN = (
    (-81, (
        "the careful writer adds many clear words to every line and keeps "
        "the tone steady so the reader stays with the story. the second "
        "sentence repeats no pair of words and offers fresh detail about "
        "the quiet morning walk through town. the final sentence closes "
        "with a calm note of thanks and sends the reader back to the start."
    )),
)


def planted_clean_docs(spark: SparkSession) -> DataFrame:
    rows = F.array(
        *[
            F.struct(
                F.lit(int(i)).cast("long").alias("doc_id"),
                F.lit(t).alias("text"),
            )
            for i, t in _PLANTED_CLEAN
        ]
    )
    return spark.range(1).select(F.explode(rows).alias("r")).select("r.*")


def sql_planted_clean() -> str:
    vals = ", ".join(f"({i}, '{t}')" for i, t in _PLANTED_CLEAN)
    return "(SELECT * FROM (VALUES " + vals + ") v(doc_id, text))"


# ---------------------------------------------------------------------------
# profile-suite rows: deterministic fail branches for the profile
# AggChecks at EVERY scale factor. The 'xx' micro-partition (3 docs,
# tiny n_chars) fails the distinct-count floor and the p50 floor for
# exactly that partition; the rogue-source doc plants one referential
# violation in the 'en' partition. Ids -91..-94 (other planted families
# use -1..-10, -51..-56, -61..-76, -81..).
_PLANTED_PROFILE = (
    (-91, "tiny xx one", "xx", "src0"),
    (-92, "tiny xx two", "xx", "src1"),
    (-93, "tiny xx three", "xx", "src2"),
    (-94, "planted rogue-source doc with plenty of characters in it", "en", "rogue"),
)


def planted_profile_docs(spark: SparkSession) -> DataFrame:
    rows = F.array(
        *[
            F.struct(
                F.lit(int(i)).cast("long").alias("doc_id"),
                F.lit(t).alias("text"),
                F.lit(lang).alias("lang"),
                F.lit(src).alias("source"),
                F.lit(len(t)).cast("long").alias("n_chars"),
            )
            for i, t, lang, src in _PLANTED_PROFILE
        ]
    )
    return spark.range(1).select(F.explode(rows).alias("r")).select("r.*")


def sql_planted_profile() -> str:
    vals = ", ".join(
        f"({i}, '{t}', '{lang}', '{src}', {len(t)})"
        for i, t, lang, src in _PLANTED_PROFILE
    )
    return (
        "(SELECT * FROM (VALUES " + vals + ") "
        "v(doc_id, text, lang, source, n_chars))"
    )


# ---------------------------------------------------------------------------
# constraint_suggestions: rows that flip the suggestion rules' OTHER
# branches, so every rule has live emit-AND-suppress cases at every sf:
#   -101 NULL text        -> text moves not_null -> null_rate_max
#   -102 empty text, n_chars 0, lang 'xx'
#                         -> n_chars min hits 0 (non_negative boundary),
#                            lang value set gains a planted member
#   -103 21st source value -> source crosses max_card=20: in_set SUPPRESSED
#   negative doc_ids       -> doc_id min < 0: non_negative suppressed for
#                            doc_id while staying unique (distinct ids)
# (doc_id, text-or-None, lang, source, n_chars)
# ---------------------------------------------------------------------------

_PLANTED_SUGGEST = (
    (-101, None, "en", "src0", 10),
    (-102, "", "xx", "src1", 0),
    (-103, "planted extra source row", "de", "plantedsrc", 24),
)


def planted_suggest_docs(spark: SparkSession) -> DataFrame:
    rows = F.array(
        *[
            F.struct(
                F.lit(int(i)).cast("long").alias("doc_id"),
                (F.lit(t) if t is not None else F.lit(None)).cast("string").alias("text"),
                F.lit(lang).alias("lang"),
                F.lit(src).alias("source"),
                F.lit(int(n)).cast("long").alias("n_chars"),
            )
            for i, t, lang, src, n in _PLANTED_SUGGEST
        ]
    )
    return spark.range(1).select(F.explode(rows).alias("r")).select("r.*")


def sql_planted_suggest() -> str:
    vals = ", ".join(
        f"({i}, {'NULL' if t is None else repr(t).replace(chr(34), chr(39))}, '{lang}', '{src}', {n})"
        for i, t, lang, src, n in _PLANTED_SUGGEST
    )
    return (
        "(SELECT cast(doc_id as bigint) AS doc_id, cast(text as varchar) AS text, "
        "lang, source, cast(n_chars as bigint) AS n_chars "
        "FROM (VALUES " + vals + ") v(doc_id, text, lang, source, n_chars))"
    )
