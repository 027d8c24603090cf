"""Turn segmentation — Spark re-expression of the reference's line
chunking (X1/X2 in SURVEY.md §2.3).

Semantics matched to the reference spec:
- greedy line packing to max_block_chars=1000 with ×1.15 tolerance,
  flush on overflow or last line (reference chunking.py:34-95);
- chunks shorter than min_block_chars=50 after strip are dropped
  (chunking.py:52);
- oversized chunks split at line boundaries to ≤1000 chars, monster
  single lines hard-split every 1000 chars (utils.py:19-69, 51-60);
- split parts carry 1-based split_index / split_total and a
  parent_block_id "chunk_<start>_<end>" (chunking.py:59-75);
- segment_hash = text_hash + start_line (+ "_partN") (chunking.py:62,78).

Execution shape: one `mapInPandas` over the transcripts table — a
flatMap (1 turn → N segment rows) that stays Arrow-batched end to end.
No shuffle: segmentation is embarrassingly parallel per turn, so the
plan is scan → project → mapInPandas with zero exchanges; at 100 TB it
scales linearly with input splits.
"""

from __future__ import annotations

import hashlib
import re
from collections.abc import Iterator
from typing import Any

import pandas as pd

from ..schema import SEGMENTS_FLAT_DDL

MIN_BLOCK_CHARS = 50
MAX_BLOCK_CHARS = 1000
TOLERANCE = 1.15

# X9 hybrid structured parser: a run of ≥ MIN_KV_RUN consecutive
# key=value lines is a typed section (reference hybrid_parsers.py:167-327
# parses config-like content into section blocks instead of generic
# chunks). Same line shape as the data.kv extraction rule.
_KV_LINE = re.compile(r"^[a-z_][a-z0-9_]*=[^\n]+$")
MIN_KV_RUN = 2

# X8 basic-line fallback: when the greedy chunker drops a turn entirely
# (all flushed chunks under MIN_BLOCK_CHARS), emit fixed line windows so
# no non-empty text is left unrepresented (reference
# block_extractor.py:212-262's 5-line fallback branch).
FALLBACK_WINDOW_LINES = 5

# re.ASCII: the SQL twin runs Java/RE2 \s (ASCII-only) — without the
# flag, Python's Unicode-aware \s classifies a U+00A0/U+2028-only turn
# 'empty' while SQL says 'prose' (cross-engine parity, see
# tests/test_cross_engine.py's non-ASCII-whitespace case)
_KV_ANY = re.compile(r"^[a-z_][a-z0-9_]*=[^\n]+$", re.M | re.ASCII)
_EMPTY = re.compile(r"\s*", re.ASCII)
_URL = re.compile(r"https?://")


def content_type_py(text: str | None) -> str:
    """Python twin of functions.textfns.content_type — same classes,
    same order, same regexes (ASCII \\s, matching Java's default) —
    used to route per-turn segmentation inside the Arrow batches (the
    Spark Column version can't run there). Kept in lockstep with the
    SQL version; the cross-engine parity test pins both against the
    same inputs, including non-ASCII whitespace."""
    t = text or ""
    if _EMPTY.fullmatch(t):
        return "empty"
    if _KV_ANY.search(t):
        return "kv"
    if "```" in t:
        return "code"
    if len(_URL.findall(t)) >= 2:
        return "url_heavy"
    return "prose"


def split_to_limit(content: str, max_chars: int = MAX_BLOCK_CHARS) -> list[str]:
    """Split content into ≤max_chars pieces at line boundaries; lines
    longer than max_chars are hard-split. Lossless (spec of the
    reference's utils.split_content)."""
    if len(content) <= max_chars:
        return [content]
    pieces: list[str] = []
    pending: list[str] = []
    pending_len = 0
    for line in content.split("\n"):
        need = len(line) + 1
        if pending and pending_len + need > max_chars:
            pieces.append("\n".join(pending))
            pending, pending_len = [], 0
        if need > max_chars:
            if pending:
                pieces.append("\n".join(pending))
                pending, pending_len = [], 0
            pieces.extend(line[i : i + max_chars] for i in range(0, len(line), max_chars))
        else:
            pending.append(line)
            pending_len += need
    if pending:
        pieces.append("\n".join(pending))
    return pieces


def chunk_turn(text: str) -> list[dict[str, Any]]:
    """Greedy line-packing chunker for one turn's text (pure function)."""
    if text is None:
        return []
    text_hash = hashlib.md5(text.encode("utf-8", errors="ignore")).hexdigest()
    lines = text.split("\n")
    out: list[dict[str, Any]] = []
    buf: list[str] = []
    buf_len = 0
    start_line = 1
    limit = MAX_BLOCK_CHARS * TOLERANCE
    for i, line in enumerate(lines):
        buf.append(line)
        buf_len += len(line) + 1
        if buf_len >= limit or i == len(lines) - 1:
            content = "\n".join(buf)
            end_line = start_line + len(buf) - 1
            if len(content.strip()) >= MIN_BLOCK_CHARS:
                if len(content) > MAX_BLOCK_CHARS:
                    parts = split_to_limit(content)
                    parent = f"chunk_{start_line}_{end_line}"
                    for pi, part in enumerate(parts):
                        out.append(
                            dict(
                                seg_type="chunk",
                                start_line=start_line,
                                end_line=end_line,
                                content=part,
                                split_index=pi + 1,
                                split_total=len(parts),
                                parent_block_id=parent,
                                segment_hash=f"{text_hash}{start_line}_part{pi + 1}",
                            )
                        )
                else:
                    out.append(
                        dict(
                            seg_type="chunk",
                            start_line=start_line,
                            end_line=end_line,
                            content=content,
                            split_index=None,
                            split_total=None,
                            parent_block_id=None,
                            segment_hash=f"{text_hash}{start_line}",
                        )
                    )
            buf, buf_len = [], 0
            start_line = i + 2
    return out


def kv_sections(text: str) -> list[dict[str, Any]]:
    """X9: typed kv_section segments for runs of consecutive key=value
    lines. Additive to the generic chunks — structured content gets a
    typed segment AND stays inside its chunk (lossless both ways)."""
    if not text or "=" not in text:
        return []
    lines = text.split("\n")
    out: list[dict[str, Any]] = []
    text_hash = None
    run_start = None
    for i in range(len(lines) + 1):
        is_kv = i < len(lines) and _KV_LINE.match(lines[i]) is not None
        if is_kv and run_start is None:
            run_start = i
        elif not is_kv and run_start is not None:
            if i - run_start >= MIN_KV_RUN:
                if text_hash is None:
                    text_hash = hashlib.md5(
                        text.encode("utf-8", errors="ignore")
                    ).hexdigest()
                out.append(
                    dict(
                        seg_type="kv_section",
                        start_line=run_start + 1,
                        end_line=i,
                        content="\n".join(lines[run_start:i]),
                        split_index=None,
                        split_total=None,
                        parent_block_id=None,
                        segment_hash=f"{text_hash}{run_start + 1}_kv",
                    )
                )
            run_start = None
    return out


def paragraphs(text: str) -> list[dict[str, Any]]:
    """Paragraph-block segmentation for prose-classified turns — the
    PlainTextParser analogue (reference hybrid_parsers.py:63-165, which
    routes plain text to its own block parser instead of the generic
    chunker). Blocks are maximal runs of non-blank lines; blocks under
    MIN_BLOCK_CHARS after strip are dropped (reference min-chunk
    discipline); blocks over MAX_BLOCK_CHARS split at line boundaries
    with the same split_index/parent convention as chunk splits."""
    if text is None or not text.strip():
        return []
    text_hash = hashlib.md5(text.encode("utf-8", errors="ignore")).hexdigest()
    lines = text.split("\n")
    out: list[dict[str, Any]] = []
    run_start: int | None = None
    for i in range(len(lines) + 1):
        nonblank = i < len(lines) and lines[i].strip() != ""
        if nonblank and run_start is None:
            run_start = i
        elif not nonblank and run_start is not None:
            content = "\n".join(lines[run_start:i])
            start_line, end_line = run_start + 1, i
            if len(content.strip()) >= MIN_BLOCK_CHARS:
                if len(content) > MAX_BLOCK_CHARS:
                    parts = split_to_limit(content)
                    parent = f"para_{start_line}_{end_line}"
                    for pi, part in enumerate(parts):
                        out.append(
                            dict(
                                seg_type="paragraph",
                                start_line=start_line,
                                end_line=end_line,
                                content=part,
                                split_index=pi + 1,
                                split_total=len(parts),
                                parent_block_id=parent,
                                segment_hash=f"{text_hash}{start_line}_para_part{pi + 1}",
                            )
                        )
                else:
                    out.append(
                        dict(
                            seg_type="paragraph",
                            start_line=start_line,
                            end_line=end_line,
                            content=content,
                            split_index=None,
                            split_total=None,
                            parent_block_id=None,
                            segment_hash=f"{text_hash}{start_line}_para",
                        )
                    )
            run_start = None
    return out


def line_windows(text: str, window: int = FALLBACK_WINDOW_LINES) -> list[dict[str, Any]]:
    """X8: fixed line-window fallback segments. A window longer than
    MAX_BLOCK_CHARS (pathological long lines in sub-min-chunk turns) is
    split into additional line_window parts via split_to_limit — never
    truncated — so the fallback's no-drop invariant holds and
    (start_line, end_line) always span exactly the lines whose content
    the parts jointly carry (same split convention as chunk splits)."""
    if text is None or not text.strip():
        return []
    text_hash = hashlib.md5(text.encode("utf-8", errors="ignore")).hexdigest()
    lines = text.split("\n")
    out: list[dict[str, Any]] = []
    for s in range(0, len(lines), window):
        chunk_lines = lines[s : s + window]
        content = "\n".join(chunk_lines)
        if not content.strip():
            continue
        start_line, end_line = s + 1, s + len(chunk_lines)
        if len(content) > MAX_BLOCK_CHARS:
            parts = split_to_limit(content)
            parent = f"win_{start_line}_{end_line}"
            for pi, part in enumerate(parts):
                out.append(
                    dict(
                        seg_type="line_window",
                        start_line=start_line,
                        end_line=end_line,
                        content=part,
                        split_index=pi + 1,
                        split_total=len(parts),
                        parent_block_id=parent,
                        segment_hash=f"{text_hash}{start_line}_win_part{pi + 1}",
                    )
                )
        else:
            out.append(
                dict(
                    seg_type="line_window",
                    start_line=start_line,
                    end_line=end_line,
                    content=content,
                    split_index=None,
                    split_total=None,
                    parent_block_id=None,
                    segment_hash=f"{text_hash}{start_line}_win",
                )
            )
    return out


def segment_turn(text: str, hybrid: bool = True) -> list[dict[str, Any]]:
    """Full cascade for one turn — the reference's route-by-type
    parse-else-chunk-else-window chain (tree_sitter → fallback parser →
    generic chunking → line windows):
    - prose-classified turns go to the paragraph parser (PlainTextParser
      analogue), falling back to greedy chunks when no paragraph
      survives the min-chars gate;
    - every other type gets greedy chunks;
    - kv runs additionally get typed kv_section segments (X9, additive);
    - the fixed line-window fallback (X8) catches turns everything else
      dropped, so no non-empty turn goes unrepresented."""
    if not hybrid:
        return chunk_turn(text)
    segs = paragraphs(text) if content_type_py(text) == "prose" else []
    if not segs:
        segs = chunk_turn(text)
    segs = segs + kv_sections(text)
    if not segs:
        segs = line_windows(text)
    return segs


def segment(transcripts_df, hybrid: bool = True):
    """transcripts → segments (flatMap via mapInPandas, Arrow-batched)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[tuple] = []
            for conv_id, turn_idx, text in zip(
                pdf["conv_id"].values, pdf["turn_idx"].values, pdf["text"].values
            ):
                for seg in segment_turn(text, hybrid=hybrid):
                    rows.append(
                        (
                            conv_id,
                            int(turn_idx),
                            seg["seg_type"],
                            seg["start_line"],
                            seg["end_line"],
                            seg["content"],
                            seg["split_index"],
                            seg["split_total"],
                            seg["parent_block_id"],
                            seg["segment_hash"],
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "conv_id", "turn_idx", "seg_type", "start_line", "end_line",
                    "content", "split_index", "split_total", "parent_block_id",
                    "segment_hash",
                ],
            )

    return transcripts_df.select("conv_id", "turn_idx", "text").mapInPandas(
        run, schema=SEGMENTS_FLAT_DDL
    )
