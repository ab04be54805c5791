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

_TOKEN_RE_C = re.compile(TOKEN_RE)


def explode_tokens(
    texts: list, already_lower: bool = False
) -> tuple[np.ndarray, list[str]]:
    """The ONE corpus tokenize convention (lowercase + ``TOKEN_RE``)
    shared by the wordcount / tf-idf / repetition / heavy-hitters /
    unigram-LM paths: returns (doc_idx int64 array, tokens list) for a
    batch of texts. None/empty texts contribute no tokens (callers that
    must mirror SQL NULL semantics handle the null mask themselves).
    Pass ``already_lower=True`` when the batch went through
    ``pc.utf8_lower`` — skips a second Python-side lower pass."""
    doc_idx: list[int] = []
    toks: list[str] = []
    if already_lower:
        for i, s in enumerate(texts):
            found = _TOKEN_RE_C.findall(s) if s else []
            doc_idx.extend([i] * len(found))
            toks.extend(found)
    else:
        for i, s in enumerate(texts):
            found = _TOKEN_RE_C.findall(s.lower()) if s else []
            doc_idx.extend([i] * len(found))
            toks.extend(found)
    return np.array(doc_idx, dtype=np.int64), toks
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


LANGID_SEEDS = {
    # Alternation ORDER is part of the algorithm (RE2 leftmost-first):
    # both the Arrow kernel and the generated DuckDB SQL build their
    # pattern from this same list, so counts agree exactly.
    "en": "the and of to in is you that it was for on are as with they at be this have from or one had by but not what all were when can there use an each which she how their if",
    "fr": "le la les de des un une et est que qui dans pour pas sur avec vous nous il elle au aux ce cette mais donc car ne se son ses leur bien plus sans tout",
    "es": "el los las y es no se por con para su al lo como mas pero sus ya este si porque esta entre cuando muy sin sobre tambien",
    "de": "der die das und ist du ich nicht es ein eine zu den dem mit sich des auf im dass er sie wir ihr aus bei nach wie auch nur vom durch",
}
LANGID_ORDER = ("en", "fr", "es", "de")  # tie-break precedence
_CJK_RE = r"[\x{4E00}-\x{9FFF}]"


def langid_sql_expr(text_col: str = "text") -> str:
    """The EXACT classifier as a DuckDB SQL expression (the langid /
    curate oracles are generated from the same seed lists + precedence
    the engine uses, so the two sides are the same algorithm twice)."""
    scores = {
        lang: (
            f"len(regexp_extract_all(lower({text_col}), "
            f"'\\b({'|'.join(words.split())})\\b'))"
        )
        for lang, words in LANGID_SEEDS.items()
    }
    s = {lang: f"s_{lang}" for lang in LANGID_ORDER}
    inner = ", ".join(f"{scores[lang]} as {s[lang]}" for lang in LANGID_ORDER)
    cjk = (
        f"len(regexp_extract_all(substr({text_col}, 1, 200), '{_CJK_RE}'))"
        f" > 0.2 * length(substr({text_col}, 1, 200))"
    )
    case = (
        f"case when {text_col} is null or length({text_col}) = 0 then 'und' "
        f"when {cjk} then 'zh' "
        f"when greatest(s_en, s_fr, s_es, s_de) = 0 then 'und' "
        f"when s_en >= s_fr and s_en >= s_es and s_en >= s_de then 'en' "
        f"when s_fr >= s_es and s_fr >= s_de then 'fr' "
        f"when s_es >= s_de then 'es' else 'de' end"
    )
    return inner, case


class LangId:
    """Stopword-count language identifier — fully vectorized.

    Per language: count of non-overlapping ``\\b(w1|w2|...)\\b`` matches
    over the lowercased text (one RE2 kernel pass per language); CJK
    codepoint density short-circuits ``zh``; argmax with the fixed
    LANGID_ORDER precedence on ties; all-zero → ``und``. Deterministic
    and expressible verbatim in DuckDB (``langid_sql_expr``), which is
    what makes `langid` and `curate` driver-oracle-checkable.

    Kept as a callable class (actor-pool shape): the per-language
    patterns are built once per actor in ``__init__``.
    """

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.patterns = {
            lang: r"\b(" + "|".join(words.split()) + r")\b"
            for lang, words in LANGID_SEEDS.items()
        }

    def __call__(self, batch: pa.Table) -> pa.Table:
        t = batch[self.text_col]
        if isinstance(t, pa.ChunkedArray):
            t = t.combine_chunks()
        n = len(t)
        low = pc.utf8_lower(t)
        scores = np.stack(
            [
                pc.count_substring_regex(low, self.patterns[lang])
                .cast(pa.int64())
                .to_numpy(zero_copy_only=False)
                for lang in LANGID_ORDER
            ]
        )  # (4, n); nulls → 0 via fill
        scores = np.nan_to_num(scores.astype(np.float64)).astype(np.int64)
        best = np.argmax(scores, axis=0)  # first max wins == precedence
        preds = np.array(LANGID_ORDER, dtype=object)[best]
        preds[scores.max(axis=0) == 0] = "und"
        head = pc.utf8_slice_codeunits(t, 0, 200)
        cjk_n = pc.count_substring_regex(head, _CJK_RE).cast(pa.float64())
        head_len = pc.utf8_length(head).cast(pa.float64())
        is_cjk = pc.fill_null(
            pc.greater(cjk_n, pc.multiply(head_len, pa.scalar(0.2))), False
        )
        preds[is_cjk.to_numpy(zero_copy_only=False).astype(bool)] = "zh"
        empty = pc.fill_null(pc.equal(pc.utf8_length(t), 0), True)
        preds[empty.to_numpy(zero_copy_only=False).astype(bool)] = "und"
        return batch.append_column(
            "lang_pred", pa.array(preds.tolist(), pa.string())
        )


class Fingerprint:
    """Winnowing document fingerprints (Schleimer et al., SIGMOD 2003):
    k-gram hashes over tokens, per-window minima kept. Emits
    ``fingerprints: list<int64>`` + ``fp_min: int64`` per doc.

    The gram hash is the oracle-shared md5-derived u64 (hash.md5_u64) so
    ``fp_min`` — min over window minima ≡ min over all gram hashes — has
    an exact DuckDB oracle (pipelines/queries.SQL_FINGERPRINT)."""

    def __init__(self, k: int = 5, window: int = 4, text_col: str = "text"):
        self.k = k
        self.window = window
        self.text_col = text_col
        self.token_re = re.compile(TOKEN_RE)

    def _fingerprints(self, text: str) -> list[int]:
        toks = self.token_re.findall(text.lower())
        if len(toks) < self.k:
            return []
        from ..hash import md5_u64_batch

        grams = [
            " ".join(toks[i : i + self.k]).encode()
            for i in range(len(toks) - self.k + 1)
        ]
        # deterministic across processes (unlike builtin hash())
        hashes = (md5_u64_batch(grams) >> np.uint64(1)).astype(np.int64)
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


def token_ngram_counts(
    ds,
    n: int = 1,
    per_doc_distinct: bool = False,
    min_count: int = 1,
    text_col: str = "text",
    hash_prefilter: bool | None = None,
    prefilter_max_keys: int = 5_000_000,
):
    """Corpus-wide token / token-n-gram frequency — the canonical
    wordcount, shaped for scale: each ``map_batches`` task tokenizes its
    batch and pre-aggregates counts locally (the combiner — the shuffle
    carries one row per DISTINCT gram per batch, not one per
    occurrence), then ONE partitioned reduce keyed on a 64-bit md5 of
    the gram sums the partials. The md5 key only ROUTES rows (same gram
    → same partition); the reduce groups by the gram string itself, so
    a key collision cannot merge distinct grams.

    ``per_doc_distinct=True`` counts each gram at most once per
    document (document frequency — the CCNet/C4-style boilerplate
    signal); ``min_count`` filters the reduced rows vectorized inside
    the reduce. Tokenization is ``TOKEN_RE`` over lowercased text,
    identical to the stats/fingerprint stages (and replicated in the
    DuckDB oracles via regexp_extract_all).

    ``hash_prefilter`` (default: auto — on when ``min_count >= 2``)
    addresses the scale wall of boilerplate-style queries, where most
    grams are singletons destined to be filtered: pass 1 ships only
    (gh:int64, cnt) rows — no strings — to find hashes with total count
    ≥ min_count; the (small) survivor-hash set is broadcast once via
    ``ray.put`` and pass 2 re-tokenizes, shipping strings ONLY for
    grams whose hash survived (the same re-tokenize-over-the-filtered-
    set trade the minhash verify gate measured as a win). EXACT either
    way: a hash collision can only admit an extra gram into pass 2, and
    the final reduce still groups by the string and re-applies
    min_count. If survivors exceed ``prefilter_max_keys`` (broadcast
    would stop being small), it falls back to the one-pass path.

    Returns a Dataset of (token, cnt) rows [n=1] or (gram, cnt) rows
    [n>1] — cnt is occurrences or document frequency per the flag."""
    import pandas as pd

    from ..hash import md5_u64_batch
    from .shuffle import partitioned_reduce

    col = "token" if n == 1 else "gram"
    token_re = re.compile(TOKEN_RE)
    if hash_prefilter is None:
        hash_prefilter = min_count >= 2

    def _gram_counts(batch: pa.Table):
        """(keys: object ndarray, counts: int64 ndarray, gh: int64
        ndarray) of the batch's distinct grams — the shared tokenize +
        local-combine pass."""
        grams: list[str] = []
        for text in batch[text_col].to_pylist():
            toks = token_re.findall(text.lower()) if text else []
            if n == 1:
                doc_grams = toks
            else:
                doc_grams = [
                    " ".join(toks[i : i + n])
                    for i in range(len(toks) - n + 1)
                ]
            if per_doc_distinct:
                doc_grams = set(doc_grams)
            grams.extend(doc_grams)
        if not grams:
            return None, None, None
        vc = pd.Series(grams).value_counts()
        keys = vc.index.to_numpy(dtype=object)
        gh = md5_u64_batch([k.encode() for k in keys]).view(np.int64)
        return keys, vc.to_numpy().astype(np.int64), gh

    def _empty() -> pa.Table:
        return pa.table(
            {
                "gh": pa.array([], pa.int64()),
                col: pa.array([], pa.string()),
                "cnt": pa.array([], pa.int64()),
            }
        )

    def combine(g):
        out = g.groupby(["gh", col], as_index=False).agg(cnt=("cnt", "sum"))
        if min_count > 1:
            out = out[out["cnt"] >= min_count]
        return out

    def _finish(red):
        return red.map_batches(
            lambda b: b.select([col, "cnt"]), batch_format="pyarrow"
        )

    def _one_pass():
        def partial(batch: pa.Table) -> pa.Table:
            keys, cnts, gh = _gram_counts(batch)
            if keys is None:
                return _empty()
            return pa.table(
                {
                    "gh": pa.array(gh, pa.int64()),
                    col: pa.array(keys, pa.string()),
                    "cnt": pa.array(cnts, pa.int64()),
                }
            )

        partials = ds.map_batches(partial, batch_format="pyarrow")
        return _finish(partitioned_reduce(partials, ["gh"], combine))

    if not hash_prefilter or min_count < 2:
        return _one_pass()

    import ray

    # pass 1: hash-only counts (16 B/row vs strings), reduce to the
    # survivor-hash set
    def partial_hashes(batch: pa.Table) -> pa.Table:
        keys, cnts, gh = _gram_counts(batch)
        if keys is None:
            return pa.table(
                {"gh": pa.array([], pa.int64()), "cnt": pa.array([], pa.int64())}
            )
        return pa.table(
            {"gh": pa.array(gh, pa.int64()), "cnt": pa.array(cnts, pa.int64())}
        )

    hash_partials = ds.map_batches(partial_hashes, batch_format="pyarrow")
    survivors_ds = partitioned_reduce(
        hash_partials,
        ["gh"],
        lambda g: g.groupby("gh", as_index=False)
        .agg(cnt=("cnt", "sum"))
        .query(f"cnt >= {int(min_count)}")[["gh"]],
    )
    chunks = []
    n_surv = 0
    for b in survivors_ds.iter_batches(batch_format="pyarrow"):
        if b.num_rows:
            chunks.append(b["gh"].to_numpy(zero_copy_only=False))
            n_surv += b.num_rows
        if n_surv > prefilter_max_keys:
            # survivor set too large to broadcast — the prefilter can't
            # pay for itself; run the exact one-pass path instead
            return _one_pass()
    allowed = np.sort(np.concatenate(chunks)) if chunks else np.empty(0, np.int64)
    allowed_ref = ray.put(allowed)

    # pass 2: strings only for surviving hashes
    def partial_filtered(batch: pa.Table) -> pa.Table:
        keys, cnts, gh = _gram_counts(batch)
        if keys is None:
            return _empty()
        al = ray.get(allowed_ref)
        pos = np.searchsorted(al, gh)
        pos[pos == len(al)] = 0
        keep = (
            (al[pos] == gh) if len(al) else np.zeros(len(gh), dtype=bool)
        )
        if not keep.any():
            return _empty()
        return pa.table(
            {
                "gh": pa.array(gh[keep], pa.int64()),
                col: pa.array(keys[keep], pa.string()),
                "cnt": pa.array(cnts[keep], pa.int64()),
            }
        )

    partials = ds.map_batches(partial_filtered, batch_format="pyarrow")
    return _finish(partitioned_reduce(partials, ["gh"], combine))


def token_tf_df(ds, text_col: str = "text"):
    """Corpus term frequency AND document frequency in ONE pass — the
    TF-IDF building block. Each ``map_batches`` task tokenizes its batch
    (lowercased ``[a-z0-9_]+``, the vocab/boilerplate convention) and
    locally combines BOTH counts: ``tf`` = total occurrences in the
    batch, ``df`` = number of the batch's documents containing the
    token (rows are whole documents, so per-batch df partials sum
    exactly). ONE partitioned reduce keyed on a 64-bit md5 of the token
    sums the partials; the md5 key only routes (the reduce groups by
    the token string itself, so a hash collision cannot merge tokens).

    Returns a Dataset of (token, tf, df) rows. Scale shape: the shuffle
    carries one row per distinct token per batch — O(vocab), not
    O(occurrences) — and the reduce output is vocab-sized."""
    import pandas as pd

    from ..hash import md5_u64_batch
    from .shuffle import partitioned_reduce

    def partial(batch: pa.Table) -> pa.Table:
        # tokenize per doc (inherently scalar), then ONE vectorized
        # (doc, token) groupby for the whole batch — no per-document
        # pandas objects on the hot path
        doc_idx, toks = explode_tokens(batch[text_col].to_pylist())
        if not toks:
            return pa.table(
                {
                    "gh": pa.array([], pa.int64()),
                    "token": pa.array([], pa.string()),
                    "tf": pa.array([], pa.int64()),
                    "df": pa.array([], pa.int64()),
                }
            )
        pairs = pd.DataFrame(
            {"i": doc_idx, "t": toks}
        ).groupby(["t", "i"], as_index=False, sort=False).size()
        agg = pairs.groupby("t", as_index=False, sort=False).agg(
            tf=("size", "sum"), df=("size", "size")
        )
        keys = agg["t"].to_numpy(dtype=object)
        gh = md5_u64_batch([k.encode() for k in keys]).view(np.int64)
        return pa.table(
            {
                "gh": pa.array(gh, pa.int64()),
                "token": pa.array(keys, pa.string()),
                "tf": pa.array(agg["tf"].to_numpy(np.int64), pa.int64()),
                "df": pa.array(agg["df"].to_numpy(np.int64), pa.int64()),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow")

    def combine(g):
        return g.groupby(["gh", "token"], as_index=False).agg(
            tf=("tf", "sum"), df=("df", "sum")
        )

    red = partitioned_reduce(partials, ["gh"], combine)
    return red.map_batches(
        lambda b: b.select(["token", "tf", "df"]), batch_format="pyarrow"
    )


def gopher_stats(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Gopher-style (Rae et al. 2021, arXiv:2112.11446 §A1.1) document
    quality gates in PURE INTEGER arithmetic — no float ratios, so the
    SQL oracle can mirror every rule exactly:

    - ``n_words``:       lowercased ``[a-z0-9_]+`` token count;
    - ``sum_word_len``:  total word characters (mean word length bounds
      become ``3·n_words ≤ sum_word_len ≤ 10·n_words`` — the published
      mean∈[3,10] rule without an average that could land on a rounding
      tie);
    - ``n_hash``/``n_ellipsis``: '#' and non-overlapping '...' counts
      (symbol-to-word ratio ≤ 0.1 becomes
      ``10·(n_hash+n_ellipsis) ≤ n_words``);
    - ``keep``:          50 ≤ n_words ≤ 100000 ∧ both rules above.

    Fully vectorized pyarrow.compute; one kernel pass per column."""
    t = batch[text_col]
    if isinstance(t, pa.ChunkedArray):
        t = t.combine_chunks()
    low = pc.utf8_lower(t)
    n_words = pc.count_substring_regex(low, r"[a-z0-9_]+").cast(pa.int64())
    sum_word_len = pc.count_substring_regex(low, r"[a-z0-9_]").cast(pa.int64())
    n_hash = pc.count_substring(t, "#").cast(pa.int64())
    n_ellipsis = pc.count_substring(t, "...").cast(pa.int64())
    words_ok = pc.and_(
        pc.greater_equal(n_words, pa.scalar(50, pa.int64())),
        pc.less_equal(n_words, pa.scalar(100_000, pa.int64())),
    )
    len_ok = pc.and_(
        pc.greater_equal(sum_word_len, pc.multiply(n_words, pa.scalar(3, pa.int64()))),
        pc.less_equal(sum_word_len, pc.multiply(n_words, pa.scalar(10, pa.int64()))),
    )
    sym_ok = pc.less_equal(
        pc.multiply(pc.add(n_hash, n_ellipsis), pa.scalar(10, pa.int64())),
        n_words,
    )
    keep = pc.and_(pc.and_(words_ok, len_ok), sym_ok)
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_words": n_words,
            "sum_word_len": sum_word_len,
            "n_hash": n_hash,
            "n_ellipsis": n_ellipsis,
            "keep": keep,
        }
    )


def repetition_stats(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Token-repetition quality signal (the Gopher §A1.1 repetition
    family adapted to the corpus shape): per document, total tokens,
    DISTINCT tokens, and the duplicate count (total − distinct) —
    all integers, so the SQL oracle mirrors exactly
    (len(regexp_extract_all) / len(list_distinct(...))).

    n_tokens is one RE2 kernel pass; the distinct count explodes the
    batch's tokens into one pandas Series and runs a C-speed
    groupby(doc).nunique() — no per-document Python. NULL text
    propagates as NULL counts (the kernel does this natively and
    ``pc.subtract`` keeps it — matching the SQL oracle, where
    regexp_extract_all(NULL) is NULL)."""
    import pandas as pd

    t = batch[text_col]
    if isinstance(t, pa.ChunkedArray):
        t = t.combine_chunks()
    low = pc.utf8_lower(t)
    n_tokens = pc.count_substring_regex(low, r"[a-z0-9_]+").cast(pa.int64())
    doc_idx, toks = explode_tokens(low.to_pylist(), already_lower=True)
    n_distinct = np.zeros(batch.num_rows, dtype=np.int64)
    if toks:
        ser = pd.DataFrame({"i": doc_idx, "t": toks})
        nd = ser.groupby("i")["t"].nunique()
        n_distinct[nd.index.to_numpy()] = nd.to_numpy()
    null_mask = pc.is_null(t).to_numpy(zero_copy_only=False)
    n_distinct_arr = pa.array(n_distinct, pa.int64(), mask=null_mask)
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_tokens": n_tokens,
            "n_distinct_tokens": n_distinct_arr,
            "n_dup_tokens": pc.subtract(n_tokens, n_distinct_arr),
        }
    )
