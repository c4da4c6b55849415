"""Text processing operators (reference T1-T11) — SQL-first.

Splitters produce the reference ``Chunk`` invariants (reference
splitters.py: first chunk pos_start=0, last chunk pos_end=len(text),
chunk text == substring(content, pos_start, pos_end)).

Where the reference shells out to langchain/nltk, we port the
deterministic behavior (documented per function) — pure column
expressions where possible, Python only for the genuinely recursive
splitter, as an Arrow-batched UDF.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from hippollm_spark.schema import CHUNKS_SCHEMA


# --------------------------------------------------------------------------
# T1 — naive fixed-size splitter (reference splitters.py:46-61)
# --------------------------------------------------------------------------

def split_naive(
    docs: DataFrame,
    chunk_size: int = 1000,
    *,
    id_col: str = "doc_id",
    text_col: str = "content",
) -> DataFrame:
    """Fixed-size char chunks with positions. Pure SQL:
    sequence → posexplode → substring, all codegen'd; scales linearly,
    no shuffle."""
    starts = F.sequence(
        F.lit(0), F.greatest(F.length(text_col) - 1, F.lit(0)), F.lit(chunk_size)
    )
    out = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.col(text_col).alias("__text__"),
            F.posexplode(starts).alias("chunk_idx", "pos_start"),
        )
        .withColumn(
            "pos_end",
            F.least(F.col("pos_start") + chunk_size, F.length("__text__")),
        )
        .withColumn(
            "text",
            F.substring(
                F.col("__text__"), F.col("pos_start") + 1, F.lit(chunk_size)
            ),
        )
        .select("doc_id", "chunk_idx", "text", "pos_start", "pos_end")
    )
    return out


# --------------------------------------------------------------------------
# T2 — paragraph splitter (reference splitters.py:80-96)
# --------------------------------------------------------------------------

def split_paragraphs(
    docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "content"
) -> DataFrame:
    """Split on '\\n\\n' with running char offsets (+2 per separator).
    Offsets via a cumulative window over (doc, chunk_idx)."""
    from pyspark.sql import Window

    parts = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(F.split(F.col(text_col), r"\n\n")).alias("chunk_idx", "text"),
    )
    w = (
        Window.partitionBy("doc_id")
        .orderBy("chunk_idx")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        parts.withColumn(
            "pos_start",
            F.coalesce(F.sum(F.length("text") + 2).over(w), F.lit(0)).cast("int"),
        )
        .withColumn("pos_end", (F.col("pos_start") + F.length("text")).cast("int"))
        .select("doc_id", "chunk_idx", "text", "pos_start", "pos_end")
    )


# --------------------------------------------------------------------------
# T3 — recursive splitter (deterministic port of the langchain
# RecursiveCharacterTextSplitter behavior used by reference
# splitters.py:64-77; separators and chunk_size from annotator.py:33)
# --------------------------------------------------------------------------

SEPARATORS = ["\n\n", "\n", ". ", "? ", "! ", "; ", ", ", " "]


def _lc_split_keep_sep(text: str, sep: str) -> list[str]:
    """langchain's _split_text_with_regex with keep_separator=True (the
    RecursiveCharacterTextSplitter default): the separator attaches to
    the FRONT of the following piece; empties dropped."""
    if sep:
        parts = re.split(f"({re.escape(sep)})", text)
        splits = [parts[i] + parts[i + 1] for i in range(1, len(parts) - 1, 2)]
        if len(parts) % 2 == 0:
            splits += parts[-1:]
        splits = [parts[0]] + splits
    else:
        splits = list(text)
    return [s for s in splits if s != ""]


def _lc_merge_splits(
    splits: list[str], separator: str, chunk_size: int, chunk_overlap: int
) -> list[str]:
    """langchain TextSplitter._merge_splits verbatim semantics: greedy
    fill to chunk_size, then slide the window start forward until total
    ≤ chunk_overlap, joined chunks whitespace-stripped (strip_whitespace
    default True), empty chunks dropped."""
    sep_len = len(separator)
    docs: list[str] = []
    current: list[str] = []
    total = 0
    for d in splits:
        _len = len(d)
        if total + _len + (sep_len if current else 0) > chunk_size:
            if current:
                doc = separator.join(current).strip()
                if doc:
                    docs.append(doc)
                while total > chunk_overlap or (
                    total + _len + (sep_len if current else 0) > chunk_size
                    and total > 0
                ):
                    total -= len(current[0]) + (
                        sep_len if len(current) > 1 else 0
                    )
                    current = current[1:]
        current.append(d)
        total += _len + (sep_len if len(current) > 1 else 0)
    doc = separator.join(current).strip()
    if doc:
        docs.append(doc)
    return docs


def _lc_recursive_split(
    text: str,
    chunk_size: int,
    chunk_overlap: int,
    seps: list[str],
) -> list[str]:
    """Faithful reimplementation of langchain's
    RecursiveCharacterTextSplitter._split_text (public algorithm,
    keep_separator=True, is_separator_regex=False): pick the first
    separator present (last as fallback), split keeping separators,
    merge runt pieces with overlap carry-over, recurse into oversized
    pieces with the REMAINING separators. Chunks are stripped and may
    overlap; they do NOT partition the input (see split_recursive for
    the lossless engine variant)."""
    final: list[str] = []
    sep = seps[-1]
    new_seps: list[str] = []
    for i, s in enumerate(seps):
        if s == "":
            sep = s
            break
        if s in text:
            sep = s
            new_seps = seps[i + 1 :]
            break
    splits = _lc_split_keep_sep(text, sep)
    merge_sep = ""  # keep_separator=True → separators already in pieces
    good: list[str] = []
    for s in splits:
        if len(s) < chunk_size:
            good.append(s)
        else:
            if good:
                final.extend(
                    _lc_merge_splits(good, merge_sep, chunk_size, chunk_overlap)
                )
                good = []
            if not new_seps:
                final.append(s)
            else:
                final.extend(
                    _lc_recursive_split(s, chunk_size, chunk_overlap, new_seps)
                )
    if good:
        final.extend(
            _lc_merge_splits(good, merge_sep, chunk_size, chunk_overlap)
        )
    return final


def _cursor_positions(txt: str, chunks: list[str]) -> list[tuple[int, int]]:
    """The reference's cursor-find position recovery
    (splitters.py:19-27), quirks included: advance a cursor by
    find()ing each chunk's first ≤100 chars in the remaining text — a
    miss (find() == -1, possible when a chunk's re-joined whitespace
    differs from the original) shifts the cursor back by one exactly
    like the reference does. Shared by the langchain-parity splitters
    so the quirk semantics stay in lockstep."""
    out = []
    i = 0
    for chunk in chunks:
        i += txt[i:].find(chunk[: min(100, len(chunk))])
        out.append((i, i + len(chunk)))
    return out


def split_recursive_langchain(
    docs: DataFrame,
    chunk_size: int = 1000,
    chunk_overlap: int = 200,
    *,
    id_col: str = "doc_id",
    text_col: str = "content",
) -> DataFrame:
    """T3 in langchain-parity mode: the exact chunking the reference
    produces (splitters.py:64-77 delegates to langchain's
    RecursiveCharacterTextSplitter with chunk_size, default overlap
    200, separators SEPARATORS). Positions recovered by the
    reference's cursor-find (splitters.py:19-27): chunks may overlap
    and whitespace between them is not covered, so pos_end − pos_start
    = len(text) but chunks do not partition the document — use
    `split_recursive` when the pipeline needs a lossless partition.

    Golden-vector tested against committed expected chunk lists on the
    reference's own fixtures (tests/assets/rust.txt, short.txt)."""

    def _split(batches):
        for pdf in batches:
            rows = []
            for did, txt in zip(pdf[id_col], pdf[text_col]):
                txt = txt or ""
                chunks = (
                    _lc_recursive_split(txt, chunk_size, chunk_overlap, SEPARATORS)
                    if txt
                    else []
                )
                for idx, (chunk, (b, e)) in enumerate(
                    zip(chunks, _cursor_positions(txt, chunks))
                ):
                    rows.append((did, idx, chunk, b, e))
            yield pd.DataFrame(
                rows, columns=["doc_id", "chunk_idx", "text", "pos_start", "pos_end"]
            )

    return docs.select(id_col, text_col).mapInPandas(_split, CHUNKS_SCHEMA)


def _recursive_split(text: str, chunk_size: int, seps: list[str]) -> list[str]:
    """Greedy recursive split: cut on the coarsest separator whose pieces
    can be merged into chunks <= chunk_size; recurse on oversized
    pieces. Separators are kept at the end of each piece (so positions
    are recoverable by cumulative length)."""
    if len(text) <= chunk_size:
        return [text] if text else []
    for i, sep in enumerate(seps):
        if sep in text:
            raw = text.split(sep)
            pieces = [p + sep for p in raw[:-1]] + ([raw[-1]] if raw[-1] else [])
            merged: list[str] = []
            cur = ""
            for p in pieces:
                if cur and len(cur) + len(p) > chunk_size:
                    merged.append(cur)
                    cur = p
                else:
                    cur += p
            if cur:
                merged.append(cur)
            out: list[str] = []
            for m in merged:
                if len(m) > chunk_size:
                    out.extend(_recursive_split(m, chunk_size, seps[i + 1 :]))
                else:
                    out.append(m)
            return out
    # No separator fits: hard cut.
    return [text[i : i + chunk_size] for i in range(0, len(text), chunk_size)]


def split_recursive(
    docs: DataFrame,
    chunk_size: int = 1000,
    *,
    id_col: str = "doc_id",
    text_col: str = "content",
) -> DataFrame:
    """T3 — recursive character splitter as a grouped Arrow UDF.

    INTENTIONAL DIVERGENCE from the reference's langchain delegate
    (splitters.py:64-77): this variant keeps separators attached, adds
    no overlap, and never strips — chunks exactly partition the
    document, so positions are cumulative-length-exact and downstream
    `text == substring(content, pos)` invariants hold. Use
    `split_recursive_langchain` for chunk-for-chunk parity with the
    reference (overlapping, stripped, find-recovered positions).

    Python is unavoidable (recursive control flow), so it runs as
    mapInPandas: one pass, no shuffle, Arrow-batched."""

    def _split(batches):
        for pdf in batches:
            rows = []
            for did, txt in zip(pdf[id_col], pdf[text_col]):
                txt = txt or ""
                pos = 0
                for idx, chunk in enumerate(_recursive_split(txt, chunk_size, SEPARATORS)):
                    rows.append((did, idx, chunk, pos, pos + len(chunk)))
                    pos += len(chunk)
            yield pd.DataFrame(
                rows, columns=["doc_id", "chunk_idx", "text", "pos_start", "pos_end"]
            )

    return docs.select(id_col, text_col).mapInPandas(_split, CHUNKS_SCHEMA)


# --------------------------------------------------------------------------
# T4 — semantic splitter (reference splitters.py:99-119 via langchain
# SemanticChunker): split at sentence boundaries where consecutive
# sentence embeddings are most dissimilar (cosine distance above the
# given percentile of all gaps in the document).
# --------------------------------------------------------------------------

_SENT_RE = re.compile(r".*?[.!?](?:\s+|$)|.+$", re.DOTALL)


def _sentences_with_spans(text: str) -> list[tuple[str, int, int]]:
    out = []
    pos = 0
    for m in _SENT_RE.finditer(text):
        s = m.group(0)
        if not s:
            continue
        out.append((s, pos, pos + len(s)))
        pos += len(s)
    return out


def split_semantic(
    docs: DataFrame,
    embed_fn,
    breakpoint_percentile: float = 80.0,
    *,
    id_col: str = "doc_id",
    text_col: str = "content",
) -> DataFrame:
    """T4 — embedding-breakpoint chunking as one Arrow stage per
    partition: sentence-split, embed each sentence with ``embed_fn``
    (text -> list[float], executor-local), compute consecutive cosine
    distances, cut where the distance exceeds the per-document
    percentile. Deterministic given a deterministic embedder."""
    import numpy as np

    def _run(batches):
        for pdf in batches:
            rows = []
            for did, txt in zip(pdf[id_col], pdf[text_col]):
                txt = txt or ""
                sents = _sentences_with_spans(txt)
                if not sents:
                    continue
                if len(sents) == 1:
                    rows.append((did, 0, sents[0][0], sents[0][1], sents[0][2]))
                    continue
                vecs = np.array([embed_fn(s) for s, _, _ in sents], dtype=np.float64)
                norms = np.linalg.norm(vecs, axis=1)
                norms[norms == 0] = 1.0
                unit = vecs / norms[:, None]
                gaps = 1.0 - np.einsum("ij,ij->i", unit[:-1], unit[1:])
                thr = np.percentile(gaps, breakpoint_percentile)
                cut_after = set(np.nonzero(gaps > thr)[0])
                chunk_start, idx = 0, 0
                for i, (_s, _b, e) in enumerate(sents):
                    if i in cut_after or i == len(sents) - 1:
                        b = sents[chunk_start][1]
                        rows.append((did, idx, txt[b:e], b, e))
                        idx += 1
                        chunk_start = i + 1
            yield pd.DataFrame(
                rows, columns=["doc_id", "chunk_idx", "text", "pos_start", "pos_end"]
            )

    return docs.select(id_col, text_col).mapInPandas(_run, CHUNKS_SCHEMA)


_LC_SENT_SPLIT_RE = re.compile(r"(?<=[.?!])\s+")


def _lc_semantic_chunks(
    text: str,
    embed_fn,
    buffer_size: int,
    percentile: float,
) -> list[str]:
    """Op-for-op replica of langchain-experimental's
    ``SemanticChunker.split_text`` with the default percentile
    breakpoint (the published algorithm; the library itself is not
    installable in this container):

    1. sentence-split on ``(?<=[.?!])\\s+`` (whitespace consumed);
    2. buffer-combine: sentence i is embedded as the " "-join of
       sentences [i-buffer .. i+buffer] (the smoothing the plain T4
       splitter intentionally omits);
    3. distance[i] = 1 − cosine(combined_i, combined_{i+1});
    4. threshold = np.percentile(distances, percentile) (linear
       interpolation, numpy default — same call the library makes);
    5. break after every i with distance[i] > threshold; each chunk is
       the " "-join of its sentences.
    """
    import numpy as np

    sentences = _LC_SENT_SPLIT_RE.split(text)
    if len(sentences) == 1:
        return sentences
    combined = []
    for i in range(len(sentences)):
        c = ""
        for j in range(max(0, i - buffer_size), i):
            c += sentences[j] + " "
        c += sentences[i]
        for j in range(i + 1, min(len(sentences), i + 1 + buffer_size)):
            c += " " + sentences[j]
        combined.append(c)
    vecs = np.array([embed_fn(c) for c in combined], dtype=np.float64)
    norms = np.linalg.norm(vecs, axis=1)
    norms[norms == 0] = 1.0
    unit = vecs / norms[:, None]
    distances = 1.0 - np.einsum("ij,ij->i", unit[:-1], unit[1:])
    threshold = np.percentile(distances, percentile)
    breakpoints = [i for i, d in enumerate(distances) if d > threshold]
    chunks = []
    start = 0
    for idx in breakpoints:
        chunks.append(" ".join(sentences[start : idx + 1]))
        start = idx + 1
    if start < len(sentences):
        chunks.append(" ".join(sentences[start:]))
    return chunks


def split_semantic_langchain(
    docs: DataFrame,
    embed_fn,
    breakpoint_percentile: float = 95.0,
    buffer_size: int = 1,
    *,
    id_col: str = "doc_id",
    text_col: str = "content",
) -> DataFrame:
    """T4 in langchain-parity mode: the chunking the reference's
    SemanticTextSplitter produces (splitters.py:99-119 delegates to
    langchain-experimental's SemanticChunker; defaults: percentile 95,
    buffer_size 1), with positions recovered by the reference's
    cursor-find (splitters.py:19-27). Because the chunk text is the
    " "-join of regex-split sentences, a chunk whose ORIGINAL
    inter-sentence whitespace was not a single space does not appear
    verbatim in the document — the reference's find() then misses
    exactly the same way, so parity includes that quirk. Use
    `split_semantic` when the pipeline needs exact-substring chunks
    that tile the document.

    Golden-vector tested on the reference's own fixtures
    (tests/assets/{rust,short}.txt) with the deterministic hash
    embedder (tests/assets_semantic_golden.json)."""

    def _split(batches):
        for pdf in batches:
            rows = []
            for did, txt in zip(pdf[id_col], pdf[text_col]):
                txt = txt or ""
                chunks = (
                    _lc_semantic_chunks(
                        txt, embed_fn, buffer_size, breakpoint_percentile
                    )
                    if txt
                    else []
                )
                for idx, (chunk, (b, e)) in enumerate(
                    zip(chunks, _cursor_positions(txt, chunks))
                ):
                    rows.append((did, idx, chunk, b, e))
            yield pd.DataFrame(
                rows, columns=["doc_id", "chunk_idx", "text", "pos_start", "pos_end"]
            )

    return docs.select(id_col, text_col).mapInPandas(_split, CHUNKS_SCHEMA)


# --------------------------------------------------------------------------
# T7 — first sentence (reference helpers.py:12-15 via nltk; deterministic
# regex port: first run of chars ending in . ! ? followed by space/EOT)
# --------------------------------------------------------------------------

def first_sentence(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    extracted = F.regexp_extract(c, r"^(.*?[.!?])(?:\s|$)", 1)
    return F.when(extracted == "", c).otherwise(extracted)


# --------------------------------------------------------------------------
# T8 — bullet-point parser (reference helpers.py:18-59). Behavior port
# validated against the reference's seven golden cases
# (tests/test_helpers.py:3-63). Python UDF (regex-heavy, cold path —
# runs on LLM output, thousands of rows not billions).
# --------------------------------------------------------------------------

_BULLET_RE = re.compile(r"^\s*(?:[-*•]|\d+[.)])\s*(.*)$")
_NONE_RE = re.compile(r"^\s*none\.?\s*$", re.IGNORECASE)
_NO_X_RE = re.compile(r"(?:there are )?no (?:facts|entities|new)", re.IGNORECASE)
_PREAMBLE_RE = re.compile(r"^(here (?:are|is)\b|facts:?$|entities:?$)", re.IGNORECASE)


def parse_bullet_points(text: str, only_first_bullets: bool = False) -> list[str]:
    """Parse an LLM bullet list: strip preambles ('Here are…', 'Facts:'),
    detect 'None' / 'no facts' / 'no entities' → [], accept -,*,• and
    '1.' numbering; bare non-empty lines count as items. With
    ``only_first_bullets``, stop at the first non-bullet line after
    bullets began (reference's only_first_bullets mode)."""
    if text is None:
        return []
    items: list[str] = []
    seen_bullet = False
    for line in text.splitlines():
        stripped = line.strip()
        if not stripped:
            if seen_bullet and only_first_bullets:
                break
            continue
        if _NONE_RE.match(stripped) or _NO_X_RE.search(stripped):
            if not items:
                return []
            continue
        m = _BULLET_RE.match(stripped)
        if m:
            if m.group(1):
                items.append(m.group(1).strip())
            seen_bullet = True
        else:
            if _PREAMBLE_RE.match(stripped):
                continue
            if seen_bullet and only_first_bullets:
                break
            items.append(stripped)
    return items


@F.udf(T.ArrayType(T.StringType()))
def parse_bullet_points_udf(text: str) -> list[str]:
    return parse_bullet_points(text)


# --------------------------------------------------------------------------
# T9-T11 — small string helpers
# --------------------------------------------------------------------------

def itemize(col: Column | str) -> Column:
    """T9 — ARRAY<STRING> → '- a\\n- b' (reference helpers.py:62-64)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(F.size(c) > 0, F.concat(F.lit("- "), F.array_join(c, "\n- "))).otherwise(
        F.lit("")
    )


def is_yes(col: Column | str) -> Column:
    """T11 — (reference helpers.py:7-9)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.lower(F.trim(c)).startswith("y")


def choice_selection(answer: str, choices: list[str]) -> str | None:
    """T10 — match a free-text answer to one of N choices: prefix pass
    then substring pass; 'none' → None (reference helpers.py:67-80)."""
    if answer is None:
        return None
    a = answer.strip().lower()
    if a.startswith("none"):
        return None
    for ch in choices:
        if a.startswith(ch.strip().lower()):
            return ch
    for ch in choices:
        if ch.strip().lower() in a:
            return ch
    return None
