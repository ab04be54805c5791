"""Multimodal (image) stages over corpus-schema tables
(image_id, bytes, w, h, fmt, caption, phash) — BASELINE.json input_hint.

Actor-pool ``map_batches`` stages; binary payload columns stay in Arrow
(zero-copy) and batches are kept small because rows are wide (ray_guide:
size batch × concurrency to the heap).

Formats: png and the corpus' lossy "jpeg" (LJPG) decode for real via
lopez_ray.media.codecs. Anything else (webp/avif/video/audio) raises
NotImplementedError at the decode seam — the decode step is STUBBED for
formats whose libraries aren't in this container, while the Ray-side
plumbing (schema, batch shapes, actor signatures, output layout) is real
and tested (per the round brief).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..media.codecs import decode
from ..media.phash import phash64


class DecodeStage:
    """bytes/fmt → decoded stats + recomputed phash (+ optional pixel
    passthrough for downstream feature stages)."""

    def __init__(self, keep_pixels: bool = False, strict: bool = False):
        self.keep_pixels = keep_pixels
        self.strict = strict

    def __call__(self, batch: pa.Table) -> pa.Table:
        datas = batch["bytes"].to_pylist()
        fmts = batch["fmt"].to_pylist()
        ok, w, h, ph, pixels = [], [], [], [], []
        for data, fmt in zip(datas, fmts):
            if data is None:
                ok.append(False); w.append(None); h.append(None); ph.append(None); pixels.append(None)
                continue
            try:
                img = decode(data, fmt)
            except NotImplementedError:
                if self.strict:
                    raise
                ok.append(False); w.append(None); h.append(None); ph.append(None); pixels.append(None)
                continue
            ok.append(True)
            h.append(img.shape[0])
            w.append(img.shape[1])
            ph.append(phash64(img))
            pixels.append(img.astype(np.uint8).tobytes() if self.keep_pixels else None)
        out = batch.append_column("decode_ok", pa.array(ok, pa.bool_()))
        out = out.append_column("dec_w", pa.array(w, pa.int32()))
        out = out.append_column("dec_h", pa.array(h, pa.int32()))
        out = out.append_column("dec_phash", pa.array(ph, pa.int64()))
        if self.keep_pixels:
            out = out.append_column("pixels", pa.array(pixels, pa.binary()))
        return out


class ResizeStage:
    """Block-mean resize of decoded pixels to (size × size) RGB; consumes
    the ``pixels`` column from DecodeStage(keep_pixels=True)."""

    def __init__(self, size: int = 16):
        self.size = size

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..media.phash import _resize_mean

        outs = []
        for data, w, h, ok in zip(
            batch["pixels"].to_pylist(),
            batch["dec_w"].to_pylist(),
            batch["dec_h"].to_pylist(),
            batch["decode_ok"].to_pylist(),
        ):
            if not ok or data is None:
                outs.append(None)
                continue
            img = np.frombuffer(data, dtype=np.uint8)
            img = img.reshape(h, w, -1).astype(np.float64)
            small = np.stack(
                [_resize_mean(img[:, :, c], self.size) for c in range(img.shape[2])],
                axis=2,
            )
            outs.append(np.clip(small, 0, 255).astype(np.uint8).tobytes())
        return batch.append_column("thumb", pa.array(outs, pa.binary()))


class ImageFeatures:
    """Cheap global features: mean/std per channel + brightness — the
    deterministic stand-in for a model-embedding stage (model load would
    live in __init__, inference in __call__)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = []
        for data, w, h, ok in zip(
            batch["pixels"].to_pylist(),
            batch["dec_w"].to_pylist(),
            batch["dec_h"].to_pylist(),
            batch["decode_ok"].to_pylist(),
        ):
            if not ok or data is None:
                feats.append(None)
                continue
            img = np.frombuffer(data, dtype=np.uint8).reshape(h, w, -1).astype(np.float64)
            f = []
            for c in range(img.shape[2]):
                f += [float(img[:, :, c].mean()), float(img[:, :, c].std())]
            f.append(float(img.mean()))
            feats.append(f)
        return batch.append_column("features", pa.array(feats, pa.list_(pa.float64())))


def image_phash_sigs(
    corpus_ds, batch_size: int = 64, concurrency: int = 2
):
    """Decode stage → flat (kid, image_id, phash, px) signature rows:
    kid = md5_u64(image_id) gives every downstream exchange an int64
    key, px = decoded pixel count (dec_w × dec_h — the keep-best
    keeper criterion rides the same decode pass); the binary payload
    is dropped HERE, before anything shuffles, per the repo's shuffle
    discipline. Rows that fail to decode are dropped (they can't
    participate in perceptual dedup)."""
    from ..hash import md5_u64_batch

    opts = dict(
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=0.5,
    )
    decoded = corpus_ds.map_batches(DecodeStage, **opts)

    def keyed(batch: pa.Table) -> pa.Table:
        # Arrow-filter FIRST: a dec_phash column containing any null
        # (failed decode) converts to float64 via to_numpy and silently
        # rounds every OTHER row's 64-bit hash; the filtered null-free
        # column converts as exact int64.
        batch = batch.filter(batch["decode_ok"])
        ids = batch["image_id"].to_pylist()
        ph = batch["dec_phash"].to_numpy(zero_copy_only=False).astype(np.int64)
        w = batch["dec_w"].to_numpy(zero_copy_only=False).astype(np.int64)
        h = batch["dec_h"].to_numpy(zero_copy_only=False).astype(np.int64)
        kid = md5_u64_batch([i.encode() for i in ids]).view(np.int64)
        return pa.table(
            {
                "kid": pa.array(kid, pa.int64()),
                "image_id": pa.array(ids, pa.string()),
                "phash": pa.array(ph, pa.int64()),
                "px": pa.array(w * h, pa.int64()),
            }
        )

    return decoded.map_batches(keyed, batch_format="pyarrow")


def image_near_dups(
    corpus_ds,
    max_hamming: int = 6,
    batch_size: int = 64,
    concurrency: int = 2,
):
    """Near-duplicate image pairs by perceptual hash: decode → recompute
    phash64 → banded hamming blocking (``signature_near_dups`` — the
    same exact pigeonhole machinery as simhash, over max_hamming+1 bit
    bands) → join the hashed keys back to image_id strings.

    The pair search runs on flat int64 (kid, phash) rows, and the
    join-back uses the partitioned hash join, so no stage holds the
    corpus or the id map in one task. Output: (a_id, b_id, hamming)
    with a_id < b_id lexically; exact at the threshold (banding finds
    every pair ≤ max_hamming, the verify recomputes true hamming)."""
    from .dedup import signature_near_dups
    from .shuffle import partitioned_lookup_join

    # materialize the slim (kid, image_id, phash) table ONCE: it is
    # consumed by several branches (pairs + both join-back hops), and
    # without the barrier each branch would re-run the decode stage —
    # the per-image compute wall — from scratch
    sigs = image_phash_sigs(corpus_ds, batch_size, concurrency).materialize()
    mapping = sigs.map_batches(
        lambda b: b.select(["kid", "image_id"]), batch_format="pyarrow"
    )
    pairs = signature_near_dups(
        sigs.map_batches(
            lambda b: b.select(["kid", "phash"]), batch_format="pyarrow"
        ),
        max_hamming,
        id_col="kid",
        sig_col="phash",
    )

    a_side = partitioned_lookup_join(
        pairs.map_batches(
            lambda b: b.rename_columns(["kid", "b", "hamming"]),
            batch_format="pyarrow",
        ),
        mapping.map_batches(
            lambda b: b.rename_columns(["kid", "a_id"]), batch_format="pyarrow"
        ),
        ["kid"],
        how="inner",
    )
    both = partitioned_lookup_join(
        a_side.map_batches(
            lambda b: pa.table(
                {
                    "kid": b["b"].cast(pa.int64()),
                    "hamming": b["hamming"].cast(pa.int64()),
                    "a_id": b["a_id"],
                }
            ),
            batch_format="pyarrow",
        ),
        mapping.map_batches(
            lambda b: b.rename_columns(["kid", "b_id"]), batch_format="pyarrow"
        ),
        ["kid"],
        how="inner",
    )

    def canon(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        a = batch["a_id"]
        b = batch["b_id"]
        swap = pc.greater(a, b)
        return pa.table(
            {
                "a_id": pc.if_else(swap, b, a),
                "b_id": pc.if_else(swap, a, b),
                "hamming": batch["hamming"].cast(pa.int64()),
            }
        )

    return both.map_batches(canon, batch_format="pyarrow")


def _phash_cluster_members(
    corpus_ds,
    max_hamming: int,
    batch_size: int,
    concurrency: int,
    with_px: bool = False,
):
    """Shared composition under both keeper variants: phash sigs →
    banded pairs on int64 kids (``signature_near_dups``) → distributed
    connected components (stages/cc.py BSP label propagation) → labels
    left-joined to ALL images (partitioned join; singletons fill with
    their own kid). Returns a Dataset of (group_kid, image_id[, px])
    rows — one per decodable image, labeled with its cluster. The
    component LABEL (hash-ordered kid min) is routing state only; the
    keeper variants recompute their keeper from the members, which is
    what lets SQL oracles reproduce them without the engine's key
    hash. One decode pass: sigs are materialized before the
    multi-branch fan-out (pairs + join-back)."""
    import pyarrow.compute as pc

    from .cc import connected_components
    from .dedup import signature_near_dups
    from .shuffle import partitioned_lookup_join

    sigs = image_phash_sigs(corpus_ds, batch_size, concurrency).materialize()
    map_cols = ["kid", "image_id"] + (["px"] if with_px else [])
    mapping = sigs.map_batches(
        lambda b: b.select(map_cols), batch_format="pyarrow"
    )
    pairs = signature_near_dups(
        sigs.map_batches(
            lambda b: b.select(["kid", "phash"]), batch_format="pyarrow"
        ),
        max_hamming,
        id_col="kid",
        sig_col="phash",
        # keeper path: downstream is CC, so identical-phash groups
        # (boilerplate logos, re-encoded copies) collapse to a rep +
        # O(m) star edges instead of C(m,2) clique pairs — components,
        # keepers, and group sizes are provably unchanged (see
        # signature_near_dups docstring; pair QUERIES keep all-pairs)
        identical_as_star=True,
    )
    labels = connected_components(
        pairs.map_batches(
            lambda b: b.select(["a", "b"]), batch_format="pyarrow"
        )
    ).map_batches(
        lambda b: b.rename_columns(["kid", "group_kid"]),
        batch_format="pyarrow",
    ).materialize()  # O(dup nodes) — small by construction
    if labels.count() == 0:
        # no near-dup pairs at all (e.g. curation filtered every twin):
        # every image is its own singleton group. Ray drops empty
        # output blocks, so the labels dataset here is SCHEMA-LESS and
        # the partitioned join below would crash resolving it.
        def selfgroup(b: pa.Table) -> pa.Table:
            cols = {
                "group_kid": b["kid"].cast(pa.int64()),
                "image_id": b["image_id"],
            }
            if with_px:
                cols["px"] = b["px"].cast(pa.int64())
            return pa.table(cols)

        return mapping.map_batches(selfgroup, batch_format="pyarrow")
    joined = partitioned_lookup_join(mapping, labels, ["kid"], how="left")

    def with_group(b: pa.Table) -> pa.Table:
        gid = pc.coalesce(
            b["group_kid"].cast(pa.int64()), b["kid"].cast(pa.int64())
        )
        cols = {"group_kid": gid, "image_id": b["image_id"]}
        if with_px:
            cols["px"] = b["px"].cast(pa.int64())
        return pa.table(cols)

    return joined.map_batches(with_group, batch_format="pyarrow")


def image_dedup_keep(
    corpus_ds,
    max_hamming: int = 6,
    batch_size: int = 64,
    concurrency: int = 2,
):
    """The image KEEPER set after perceptual-hash near-dup clustering:
    one row per duplicate cluster — (keeper_id, group_size) — where the
    keeper is the lexically-least image_id in the connected component
    of the hamming ≤ max_hamming pair graph and group_size is how many
    images it absorbed (singletons keep themselves, size 1).
    ``_phash_cluster_members`` + ONE partitioned reduce per group
    computing (min(image_id), count)."""
    from .shuffle import partitioned_reduce

    grouped = _phash_cluster_members(
        corpus_ds, max_hamming, batch_size, concurrency
    )

    def combine(g):
        return g.groupby("group_kid", as_index=False).agg(
            keeper_id=("image_id", "min"), group_size=("image_id", "size")
        )

    sizes = partitioned_reduce(grouped, ["group_kid"], combine)

    def finish(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "keeper_id": b["keeper_id"],
                "group_size": b["group_size"].cast(pa.int64()),
            }
        )

    return sizes.map_batches(finish, batch_format="pyarrow")


def image_exact_dedup(corpus_ds, batch_size: int = 64, key_col: str = "bytes"):
    """EXACT image dedup — keep the lexically-least image_id per
    identical-``key_col`` group. With the default ``key_col="bytes"``
    this is the cheap first rung of the image dedup ladder (before
    perceptual hashing): re-crawled and hot-linked copies of the same
    file are byte-equal, so a 128-bit MD5 over the raw payload
    collapses them without decoding a single pixel. With
    ``key_col="caption"`` it is the cross-modal variant — alt-text
    reuse marks re-posts whose pixels were re-encoded (the fixture's
    near-dups share their source's caption but not its bytes).

    THE text ``exact_dedup`` (stages/dedup.py), not a copy of it: the
    payload is hashed inside ``map_batches`` (never leaves the task),
    then ONE partitioned reduce keyed on the 128-bit content hash
    computes (min image_id, group size); this wrapper only re-projects
    to the image-family column names. Output: (keeper_id, n_copies) —
    one row per distinct key."""
    from .dedup import exact_dedup

    dedup = exact_dedup(
        corpus_ds, col=key_col, id_col="image_id", batch_size=batch_size
    )
    return dedup.map_batches(
        lambda b: pa.table(
            {
                "keeper_id": b["image_id"],
                "n_copies": b["n"].cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def image_curate(
    corpus_ds,
    min_side: int = 32,
    max_aspect_num: int = 2,
    batch_size: int = 64,
    concurrency: int = 2,
    keep_cols: list | None = None,
):
    """LAION-style image curation filter: decode the payload and keep
    images whose DECODED dimensions satisfy min(w, h) ≥ ``min_side``
    and max(w, h) ≤ ``max_aspect_num`` × min(w, h) (the aspect gate is
    integer arithmetic — no float-ratio edge cases to mirror in SQL).
    Rows that fail to decode are dropped (can't be curated). Output:
    (image_id, dec_w, dec_h, px) for keepers, plus any ``keep_cols``
    passed through verbatim (e.g. ``["bytes", "fmt"]`` so a downstream
    clustering stage can consume the curated survivors directly).

    The decision runs on the decoded dims, not stored metadata — a
    corpus with lying metadata is exactly what a curation filter is
    for; the fixture generator's stored w/h double as the oracle."""
    import pyarrow.compute as pc

    opts = dict(
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=0.5,
    )
    decoded = corpus_ds.map_batches(DecodeStage, **opts)
    passthrough = list(keep_cols or [])

    def keep(batch: pa.Table) -> pa.Table:
        # ONE mask, ONE filter: decode_ok ∧ dims gates together
        # (and_kleene: failed decodes have null dims → null dims_ok,
        # which Kleene-ands with decode_ok=false to false)
        w = batch["dec_w"].cast(pa.int64())
        h = batch["dec_h"].cast(pa.int64())
        mn = pc.min_element_wise(w, h)
        mx = pc.max_element_wise(w, h)
        dims_ok = pc.and_(
            pc.greater_equal(mn, pa.scalar(min_side, pa.int64())),
            pc.less_equal(
                mx, pc.multiply(mn, pa.scalar(max_aspect_num, pa.int64()))
            ),
        )
        mask = pc.fill_null(
            pc.and_kleene(batch["decode_ok"], dims_ok), False
        )
        b = batch.append_column("px", pc.multiply(w, h)).filter(mask)
        cols = {
            "image_id": b["image_id"],
            "dec_w": b["dec_w"].cast(pa.int32()),
            "dec_h": b["dec_h"].cast(pa.int32()),
            "px": b["px"],
        }
        for c in passthrough:
            cols[c] = b[c]
        return pa.table(cols)

    return decoded.map_batches(keep, batch_format="pyarrow")


def image_dedup_keep_best(
    corpus_ds,
    max_hamming: int = 6,
    batch_size: int = 64,
    concurrency: int = 2,
):
    """Keeper set that keeps the BEST copy per perceptual cluster —
    highest decoded resolution (px = w × h), ties broken by lexical-min
    image_id — instead of ``image_dedup_keep``'s id-min convention.
    This is the realistic curation choice: near-dup clusters produced
    by re-encodes and thumbnails should keep the original, and pixel
    count is the standard proxy.

    Same composition as ``image_dedup_keep``
    (``_phash_cluster_members`` with px riding along), but the final
    per-group reduce sorts (px desc, image_id asc) and takes the first
    row. Output: (keeper_id, keeper_px, group_size)."""
    from .shuffle import partitioned_reduce

    grouped = _phash_cluster_members(
        corpus_ds, max_hamming, batch_size, concurrency, with_px=True
    )

    def combine(g):
        g = g.sort_values(
            ["group_kid", "px", "image_id"],
            ascending=[True, False, True],
            kind="mergesort",
        )
        return g.groupby("group_kid", as_index=False).agg(
            keeper_id=("image_id", "first"),
            keeper_px=("px", "first"),
            group_size=("image_id", "size"),
        )

    sizes = partitioned_reduce(grouped, ["group_kid"], combine)

    def finish(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "keeper_id": b["keeper_id"],
                "keeper_px": b["keeper_px"].cast(pa.int64()),
                "group_size": b["group_size"].cast(pa.int64()),
            }
        )

    return sizes.map_batches(finish, batch_format="pyarrow")


def corpus_pipeline(corpus_ds, batch_size: int = 64, concurrency: int = 2):
    """decode → resize → features over a corpus Dataset; small batches
    because rows carry image payloads.

    Each of the three actor pools asks for 0.5 CPU so the chain
    (3 pools × concurrency actors) plus the read tasks stays schedulable
    even in a 4-CPU session; at cluster scale raise concurrency, not
    num_cpus — the stages are per-row numpy work that doesn't fan out
    threads."""
    opts = dict(
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=0.5,
    )
    return (
        corpus_ds.map_batches(
            DecodeStage, fn_constructor_kwargs={"keep_pixels": True}, **opts
        )
        .map_batches(ResizeStage, **opts)
        .map_batches(ImageFeatures, **opts)
        .drop_columns(["pixels", "bytes"])
    )


def image_format_stats(corpus_ds, batch_size: int = 64, concurrency: int = 2):
    """Per-FORMAT corpus inventory (the "what's in this 100 TB of
    images" sweep): decode each payload, then aggregate per ``fmt`` —
    image count, total encoded bytes, total DECODED pixels. The pixel
    sum comes from the decoder, not stored metadata, so the aggregate
    doubles as a whole-corpus decode-dims parity check (the oracle sums
    the generator's stored w·h).

    Shuffle shape: per-batch pyarrow ``group_by`` combiner (one row per
    format per batch crosses the wire — O(formats), bytes/pixels summed
    locally) → tiny global groupby; format cardinality is O(10), so the
    exchange is negligible at any corpus size."""
    import pyarrow.compute as pc

    opts = dict(
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=0.5,
    )

    def partial(batch: pa.Table) -> pa.Table:
        # a NULL payload passes DecodeStage(strict) with decode_ok=False
        # (strict only raises on NotImplementedError); counting such a
        # row in n_images while its null dims silently drop out of
        # sum_px would diverge from the oracle's per-row w·h sum — this
        # stage is billed as a whole-corpus parity check, so fail LOUD
        bad = pc.sum(
            pc.cast(pc.invert(pc.fill_null(batch["decode_ok"], False)), pa.int64())
        ).as_py()
        if bad:
            raise ValueError(
                f"image_format_stats: {bad} rows failed to decode; the "
                "per-format sums would silently diverge from the corpus"
            )
        nbytes = pc.binary_length(
            batch["bytes"].cast(pa.large_binary())
        ).cast(pa.int64())
        px = pc.multiply(
            batch["dec_w"].cast(pa.int64()), batch["dec_h"].cast(pa.int64())
        )
        t = pa.table(
            {
                "fmt": batch["fmt"],
                "n_images": pa.array(
                    np.ones(batch.num_rows, dtype=np.int64), pa.int64()
                ),
                "total_bytes": nbytes,
                "sum_px": px,
            }
        )
        return t.group_by(["fmt"]).aggregate(
            [("n_images", "sum"), ("total_bytes", "sum"), ("sum_px", "sum")]
        )

    decoded = corpus_ds.map_batches(
        DecodeStage, fn_constructor_kwargs={"strict": True}, **opts
    )
    from .shuffle import grouped_sum_max

    agg = grouped_sum_max(
        decoded.map_batches(partial, batch_format="pyarrow"),
        ["fmt"],
        sums={
            "n_images_sum": "n_images",
            "total_bytes_sum": "total_bytes",
            "sum_px_sum": "sum_px",
        },
    )

    def finish(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "fmt": b["fmt"],
                "n_images": b["n_images"].cast(pa.int64()),
                "total_bytes": b["total_bytes"].cast(pa.int64()),
                "sum_px": b["sum_px"].cast(pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")
