"""Text-analysis stages — the large-scale training-data-pipeline operators
over a text column: token counting, quality scoring, language ID,
fingerprinting. All vectorized pyarrow.compute / RE2 kernels inside
``map_batches``; every rule here is deliberately SQL-expressible so the
driver's DuckDB oracle can value-check the whole stage (see
__ray_entry__.oracle_sql). Keep :data:`STOPWORDS` / :data:`LANG_MARKERS` and
the SQL snippets in lockstep.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..hashing import hash64_batch

# word-boundary stopword set for stop_ratio (quality scoring)
STOPWORDS = ("the", "and", "of", "to", "in", "is", "it", "a")
STOP_RE = r"\b(" + "|".join(STOPWORDS) + r")\b"
PUNCT_RE = r"[.!?,;:]"
TOKEN_RE = r"\S+"
WORD_RE = r"\w+"
# BPE-ish pre-tokenizer: the GPT-2 pattern family restated in the
# lookahead-free RE2 subset (contraction suffixes, space-prefixed letter /
# digit / symbol runs) — identical match counts in pyarrow and DuckDB since
# both embed RE2, so the count is oracle-checkable
BPE_RE = r"'(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}']+"
CJK_RE = r"[一-鿿]"

# language-marker stopword sets; priority order breaks ties (en>de>fr>es)
LANG_MARKERS = {
    "en": ("the", "and", "is", "of", "was", "to"),
    "de": ("der", "die", "das", "und", "nicht", "ist", "ein"),
    "fr": ("le", "la", "les", "et", "est", "une", "dans"),
    "es": ("el", "los", "las", "es", "una", "y", "en"),
}
LANG_PRIORITY = ("en", "de", "fr", "es")


def _round_half_away(x: np.ndarray, digits: int) -> np.ndarray:
    # SQL round() rounds half away from zero; np.round is banker's rounding
    # (0.3703125 -> 0.370312 vs DuckDB's 0.370313)
    f = 10.0**digits
    return np.sign(x) * np.floor(np.abs(x) * f + 0.5) / f


def _count(col: pa.Array, pattern: str) -> np.ndarray:
    return np.asarray(
        pc.fill_null(pc.count_substring_regex(col, pattern), 0), dtype=np.float64
    )


def set_column(batch: pa.Table, name: str, arr: pa.Array) -> pa.Table:
    """Append, or overwrite when the input already carries the column."""
    i = batch.schema.get_field_index(name)
    if i >= 0:
        return batch.set_column(i, name, arr)
    return batch.append_column(name, arr)


def text_stats(batch: pa.Table, *, col: str = "text") -> pa.Table:
    """Append n_chars, n_tokens, n_words, punct_ratio, stop_ratio, quality.

    quality ∈ [0,1]: 0.5·min(n_tokens,256)/256 + 0.3·min(stop_ratio·4,1)
                     + 0.2·(1−min(punct_ratio·10,1)), rounded to 6 dp —
    an interpretable length/stopword/punctuation blend (the standard
    heuristic trio), chosen to be exactly reproducible in SQL.
    """
    text = batch[col]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    lower = pc.utf8_lower(text)
    n_chars = np.asarray(pc.fill_null(pc.utf8_length(text), 0), dtype=np.float64)
    n_tokens = _count(text, TOKEN_RE)
    n_tokens_bpe = _count(text, BPE_RE)
    n_words = _count(text, WORD_RE)
    punct = _count(text, PUNCT_RE)
    stops = _count(lower, STOP_RE)
    denom_c = np.maximum(n_chars, 1.0)
    denom_t = np.maximum(n_tokens, 1.0)
    punct_ratio = punct / denom_c
    stop_ratio = stops / denom_t
    quality = (
        0.5 * np.minimum(n_tokens, 256.0) / 256.0
        + 0.3 * np.minimum(stop_ratio * 4.0, 1.0)
        + 0.2 * (1.0 - np.minimum(punct_ratio * 10.0, 1.0))
    )
    null = np.asarray(pc.is_null(text))

    def col_of(arr, typ):
        a = pa.array(arr, typ)
        if null.any():
            a = pc.if_else(pa.array(null), pa.scalar(None, typ), a)
        return a

    out = batch
    for name, arr, typ in [
        ("n_chars", n_chars.astype(np.int64), pa.int64()),
        ("n_tokens", n_tokens.astype(np.int64), pa.int64()),
        ("n_tokens_bpe", n_tokens_bpe.astype(np.int64), pa.int64()),
        ("n_words", n_words.astype(np.int64), pa.int64()),
        ("punct_ratio", _round_half_away(punct_ratio, 6), pa.float64()),
        ("stop_ratio", _round_half_away(stop_ratio, 6), pa.float64()),
        ("quality", _round_half_away(quality, 6), pa.float64()),
    ]:
        out = set_column(out, name, col_of(arr, typ))
    return out


def lang_id(batch: pa.Table, *, col: str = "text", out: str = "lang_pred") -> pa.Table:
    """Append a language guess from marker-stopword counts.

    Rule (exactly mirrored in SQL): any CJK char ⇒ 'zh'; else the
    highest-scoring marker set wins with priority en>de>fr>es on ties;
    all-zero ⇒ 'und'; null text ⇒ null.
    """
    text = batch[col]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    lower = pc.utf8_lower(text)
    cjk = _count(text, CJK_RE)
    scores = {
        lang: _count(lower, r"\b(" + "|".join(words) + r")\b")
        for lang, words in LANG_MARKERS.items()
    }
    n = len(text)
    # deterministic argmax: first language in priority order wins ties
    pred = np.full(n, "und", dtype=object)
    best = np.zeros(n)
    for lang in LANG_PRIORITY:
        s = scores[lang]
        win = s > best
        pred[win] = lang
        best = np.maximum(best, s)
    pred[cjk > 0] = "zh"
    null = np.asarray(pc.is_null(text))
    pred[null] = None
    return set_column(batch, out, pa.array(pred, pa.string()))


def lang_id_sql(col: str = "text", out: str = "lang_pred") -> str:
    """The identical rule as a DuckDB SQL expression."""

    def cnt(words):
        pat = r"\b(" + "|".join(words) + r")\b"
        return f"length(regexp_extract_all(lower({col}), '{pat}'))"

    en, de, fr, es = (cnt(LANG_MARKERS[l]) for l in LANG_PRIORITY)
    return f"""CASE
  WHEN {col} IS NULL THEN NULL
  WHEN length(regexp_extract_all({col}, '{CJK_RE}')) > 0 THEN 'zh'
  WHEN {en} >= {de} AND {en} >= {fr} AND {en} >= {es} AND {en} > 0 THEN 'en'
  WHEN {de} >= {fr} AND {de} >= {es} AND {de} > 0 THEN 'de'
  WHEN {fr} >= {es} AND {fr} > 0 THEN 'fr'
  WHEN {es} > 0 THEN 'es'
  ELSE 'und' END AS {out}"""


def text_stats_sql(col: str = "text") -> list[str]:
    """DuckDB expressions matching :func:`text_stats` column-for-column."""
    n_chars = f"coalesce(length({col}), 0)"
    n_tokens = f"coalesce(length(regexp_extract_all({col}, '{TOKEN_RE}')), 0)"
    bpe_sql = BPE_RE.replace("'", "''")  # SQL string-literal escaping
    n_tokens_bpe = (
        f"coalesce(length(regexp_extract_all({col}, '{bpe_sql}')), 0)"
    )
    n_words = f"coalesce(length(regexp_extract_all({col}, '{WORD_RE}')), 0)"
    punct = f"coalesce(length(regexp_extract_all({col}, '{PUNCT_RE}')), 0)"
    stops = f"coalesce(length(regexp_extract_all(lower({col}), '{STOP_RE}')), 0)"
    punct_ratio = f"({punct} / greatest({n_chars}, 1))"
    stop_ratio = f"({stops} / greatest({n_tokens}, 1))"
    quality = (
        f"(0.5 * least({n_tokens}, 256) / 256.0"
        f" + 0.3 * least({stop_ratio} * 4.0, 1.0)"
        f" + 0.2 * (1.0 - least({punct_ratio} * 10.0, 1.0)))"
    )
    null_wrap = lambda e, name: (
        f"CASE WHEN {col} IS NULL THEN NULL ELSE {e} END AS {name}"
    )
    return [
        null_wrap(n_chars, "n_chars"),
        null_wrap(n_tokens, "n_tokens"),
        null_wrap(n_tokens_bpe, "n_tokens_bpe"),
        null_wrap(n_words, "n_words"),
        null_wrap(f"round({punct_ratio}, 6)", "punct_ratio"),
        null_wrap(f"round({stop_ratio}, 6)", "stop_ratio"),
        null_wrap(f"round({quality}, 6)", "quality"),
    ]


# ---------------------------------------------------------------------------
# Fingerprinting
# ---------------------------------------------------------------------------

_WS_RE = r"\s+"


def _normalize(text: pa.Array) -> pa.Array:
    return pc.replace_substring_regex(pc.utf8_lower(text), _WS_RE, " ")


def fingerprint(
    batch: pa.Table, *, col: str = "text", out: str = "fingerprint", algo: str = "xxh64"
) -> pa.Table:
    """Append a content fingerprint of the normalized text.

    algo='xxh64' (default): the engine's vectorized 64-bit hash as hex —
    the scale path. algo='md5': hashlib per row — slower, but exactly
    reproducible in SQL (DuckDB md5()) for the correctness oracle.
    """
    text = batch[col]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    norm = _normalize(text)
    null = np.asarray(pc.is_null(text))
    if algo == "md5":
        vals = norm.to_pylist()
        fps = np.array(
            [
                None if v is None else hashlib.md5(v.encode("utf-8")).hexdigest()
                for v in vals
            ],
            dtype=object,
        )
    elif algo == "xxh64":
        h = hash64_batch(norm, seed=0)
        fps = np.array([format(x, "016x") for x in h], dtype=object)
        fps[null] = None
    else:
        raise ValueError(f"unknown fingerprint algo: {algo}")
    return set_column(batch, out, pa.array(fps, pa.string()))


def fingerprint_sql(col: str = "text", out: str = "fingerprint") -> str:
    """DuckDB expression matching fingerprint(algo='md5')."""
    return (
        f"md5(regexp_replace(lower({col}), '{_WS_RE}', ' ', 'g')) AS {out}"
    )


# ---------------------------------------------------------------------------
# PII redaction (corpus-cleaning op; reference engine has no text transforms
# at all — src/markdups.cxx treats records as opaque. This extends the
# SURVEY.md §2.9 corpus family the way C4/Gopher pipelines pair cleaning
# with redaction.)
# ---------------------------------------------------------------------------

# Deliberately simple RE2 patterns: BOTH pyarrow.compute and DuckDB run RE2,
# so keeping to shared-core syntax (no lookaround, no backrefs) makes every
# replacement decision identical in the engine and the SQL oracle twin.
PII_PATTERNS = (
    # order matters: emails first (an email contains digit runs), then IPv4,
    # then long digit runs (phone-ish / account-ish identifiers)
    ("email", r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("digits", r"\b\d{7,}\b", "<NUM>"),
)


def redact_pii(batch: pa.Table, *, col: str = "text") -> pa.Table:
    """Vectorized PII scrub: replaces emails / IPv4s / 7+-digit runs with
    typed placeholders and appends per-kind match counts (`n_email`,
    `n_ipv4`, `n_digits`) plus the redacted text (`text_redacted`).
    One pyarrow.compute kernel per pattern — no Python per row."""
    text = batch[col]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    out = text
    for name, pattern, token in PII_PATTERNS:
        n = pc.fill_null(pc.count_substring_regex(out, pattern), 0)
        batch = set_column(batch, f"n_{name}", pc.cast(n, pa.int64()))
        out = pc.replace_substring_regex(out, pattern, token)
    return set_column(batch, "text_redacted", out)


def redact_pii_sql(col: str = "text") -> list[str]:
    """SQL twins of :func:`redact_pii` (DuckDB regexp_* is RE2 too, so the
    same patterns make the same decisions). Returns the select expressions
    for the counts and the redacted text, applied in the same order."""
    exprs = []
    chain = col
    for name, pattern, token in PII_PATTERNS:
        pat = pattern.replace("'", "''")
        # COALESCE mirrors the engine's fill_null(count, 0) on null text
        exprs.append(
            f"CAST(COALESCE(len(regexp_extract_all({chain}, '{pat}')), 0) "
            f"AS BIGINT) AS n_{name}"
        )
        chain = f"regexp_replace({chain}, '{pat}', '{token}', 'g')"
    exprs.append(f"{chain} AS text_redacted")
    return exprs
