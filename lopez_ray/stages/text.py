"""Text-analysis stages for large-scale training-data pipelines:
language ID, quality scoring, token counting, document fingerprinting.

All are ``map_batches``-shaped: vectorized pyarrow.compute kernels where
possible, callable classes (actor pools) where state is built once
(compiled regexes, n-gram profiles). Designed so the per-batch cost is
O(bytes) with no Python-per-row work in the hot paths that matter.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

TOKEN_RE = r"[A-Za-z0-9_]+"
PUNCT_RE = r"[^\w\s]"
STOPWORDS = (
    "the a an and or of to in is are was were be been it this that for on "
    "with as at by from not"
).split()


def text_stats(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Quality-signal columns: n_chars, n_bytes, n_tokens, n_punct,
    stop_ratio, upper_ratio. Pure pyarrow.compute — fully vectorized,
    SQL-oracle-expressible (see pipelines/queries.py)."""
    t = batch[text_col]
    if isinstance(t, pa.ChunkedArray):
        t = t.combine_chunks()
    n_chars = pc.utf8_length(t).cast(pa.int64())
    n_bytes = pc.binary_length(t.cast(pa.large_binary())).cast(pa.int64())
    n_tokens = pc.count_substring_regex(t, TOKEN_RE).cast(pa.int64())
    n_punct = pc.count_substring_regex(t, PUNCT_RE).cast(pa.int64())
    n_stop = pc.count_substring_regex(
        t, r"\b(" + "|".join(STOPWORDS) + r")\b"
    ).cast(pa.float64())
    n_upper = pc.count_substring_regex(t, r"[A-Z]").cast(pa.float64())
    tok_f = pc.max_element_wise(n_tokens.cast(pa.float64()), pa.scalar(1.0))
    chars_f = pc.max_element_wise(n_chars.cast(pa.float64()), pa.scalar(1.0))
    out = batch.drop_columns([c for c in batch.column_names if c != "doc_id"])
    out = out.append_column("n_chars", n_chars)
    out = out.append_column("n_bytes", n_bytes)
    out = out.append_column("n_tokens", n_tokens)
    out = out.append_column("n_punct", n_punct)
    out = out.append_column("stop_ratio", pc.divide(n_stop, tok_f))
    out = out.append_column("upper_ratio", pc.divide(n_upper, chars_f))
    return out


def quality_score(batch: pa.Table) -> pa.Table:
    """Composite [0,1] quality score from the stats columns — a
    C4/Gopher-style heuristic blend (length band, punctuation sanity,
    stopword presence)."""
    n_tokens = batch["n_tokens"].to_numpy(zero_copy_only=False).astype(np.float64)
    n_chars = batch["n_chars"].to_numpy(zero_copy_only=False).astype(np.float64)
    stop = batch["stop_ratio"].to_numpy(zero_copy_only=False)
    punct = batch["n_punct"].to_numpy(zero_copy_only=False) / np.maximum(n_chars, 1)
    length_band = np.clip((n_tokens - 5) / 45.0, 0, 1)  # 5..50 tokens ramps
    stop_band = np.clip(stop / 0.2, 0, 1)  # natural text has stopwords
    punct_sanity = 1.0 - np.clip((punct - 0.2) / 0.3, 0, 1)
    score = 0.4 * length_band + 0.3 * stop_band + 0.3 * punct_sanity
    return batch.append_column("quality", pa.array(score, pa.float64()))


class LangId:
    """Character-profile language identifier (actor-pool stage).

    Heuristic n-gram/charset classifier: CJK codepoint ranges short-circuit
    zh/ja/ko; otherwise a cosine match of character-trigram frequencies
    against tiny embedded profiles built from common-word lists. State
    (profiles) is built once per actor (__init__), per the actor-pool
    pattern for stateful stages.
    """

    SEEDS = {
        "en": "the and of to in is you that it he was for on are as with his they i at be this have from or one had by word but not what all were we when your can said there use an each which she do how their if",
        "fr": "le la les de des un une et est que qui dans pour pas sur avec vous nous il elle au aux ce cette mais ou donc car ne se son ses leur bien plus sans tout",
        "es": "el la los las de un una y es que en no se por con para su al lo como mas pero sus le ya o este si porque esta entre cuando muy sin sobre tambien",
        "de": "der die das und ist du ich nicht es ein eine zu den dem mit sich des auf fur im dass er sie wir ihr aus bei nach wie uber auch nur vom durch",
    }

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.profiles = {}
        for lang, words in self.SEEDS.items():
            prof: dict[str, float] = {}
            text = " " + words.replace(" ", "  ") + " "
            for i in range(len(text) - 2):
                g = text[i : i + 3]
                prof[g] = prof.get(g, 0.0) + 1.0
            norm = sum(v * v for v in prof.values()) ** 0.5
            self.profiles[lang] = {g: v / norm for g, v in prof.items()}

    def _classify(self, text: str) -> str:
        if not text:
            return "und"
        cjk = sum(1 for ch in text[:200] if "一" <= ch <= "鿿")
        if cjk > len(text[:200]) * 0.2:
            return "zh"
        sample = " " + text[:500].lower() + " "
        counts: dict[str, float] = {}
        for i in range(len(sample) - 2):
            g = sample[i : i + 3]
            counts[g] = counts.get(g, 0.0) + 1.0
        norm = sum(v * v for v in counts.values()) ** 0.5 or 1.0
        best, best_s = "und", 0.0
        for lang, prof in self.profiles.items():
            s = sum(prof.get(g, 0.0) * v for g, v in counts.items()) / norm
            if s > best_s:
                best, best_s = lang, s
        return best

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch[self.text_col]
        preds = [
            "und" if v is None else self._classify(v) for v in col.to_pylist()
        ]
        return batch.append_column("lang_pred", pa.array(preds, pa.string()))


class Fingerprint:
    """Winnowing document fingerprints (Schleimer et al., SIGMOD 2003):
    rolling Karp-Rabin hashes over token k-grams, per-window minima kept.
    Emits ``fingerprints: list<int64>`` + ``fp_min: int64`` per doc."""

    def __init__(self, k: int = 5, window: int = 4, text_col: str = "text"):
        self.k = k
        self.window = window
        self.text_col = text_col
        self.token_re = re.compile(TOKEN_RE)

    def _fingerprints(self, text: str) -> list[int]:
        toks = self.token_re.findall(text.lower())
        if len(toks) < self.k:
            return []
        from ..hash import siphash24_batch

        grams = [
            " ".join(toks[i : i + self.k]).encode()
            for i in range(len(toks) - self.k + 1)
        ]
        # deterministic across processes (unlike builtin hash())
        hashes = (siphash24_batch(grams) >> np.uint64(1)).astype(np.int64)
        n = len(hashes)
        if n <= self.window:
            return [int(hashes.min())]
        idx = np.arange(n - self.window + 1)
        windows = hashes[idx[:, None] + np.arange(self.window)]
        mins = windows.min(axis=1)
        out = sorted(set(int(m) for m in mins))
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        fps = [
            [] if v is None else self._fingerprints(v)
            for v in batch[self.text_col].to_pylist()
        ]
        batch = batch.append_column(
            "fingerprints", pa.array(fps, pa.list_(pa.int64()))
        )
        batch = batch.append_column(
            "fp_min",
            pa.array([min(f) if f else None for f in fps], pa.int64()),
        )
        return batch
