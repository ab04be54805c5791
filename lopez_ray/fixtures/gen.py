"""Deterministic synthetic web fixtures (FIXTURES.md).

Generates, with a fixed seed and no external data:

- ``corpus``  — (image_id, bytes, w, h, fmt, caption, phash): the payload
  table per BASELINE.json input_hint. Images are seeded gradient+noise,
  PNG (lossless) and LJPG ("jpeg", lossy) mixed; ``phash`` is computed
  from the *decoded* pixels so the per-row invariant is exact.
- ``web``     — (url, host, status_code, redirect_to, links, canonical,
  image_id, latency_ms): everything the reference's Downloaded enum
  distinguishes (downloader/mod.rs:17-29). Zipf-skewed host sizes
  exercise hot-host handling; raw hrefs include relative, absolute,
  ``#frag``, mailto:, and off-site forms to exercise checked_join.
- ``robots``  — (host, robots_txt nullable): wildcard rules, Crawl-delay.

``render_page(row)`` deterministically renders the HTML body the synthetic
"server" answers with; the fetch stage calls it instead of storing HTML.

Tiers (FIXTURES.md §6): t1 ~200 pages / 4 hosts, t2 ~2,000 / 10,
bench ~50,000 / 50. Tables are cached as parquet under the given dir.
"""

from __future__ import annotations

import hashlib
import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..media.codecs import decode, encode
from ..media.phash import phash64

TIERS = {
    "t1": {"pages": 200, "hosts": 4},
    "t2": {"pages": 2000, "hosts": 10},
    "bench": {"pages": 50000, "hosts": 50},
    # scaling-efficiency tiers: enough per-wave parallel work that the
    # fixed per-wave barrier cost stops dominating — the honest stand-in
    # for the north rule's 10^10-frontier regime where waves are millions
    # of rows.
    "bench-xl": {"pages": 200000, "hosts": 100},
    "bench-xxl": {"pages": 1000000, "hosts": 200},
    "bench-2m": {"pages": 2000000, "hosts": 400},
}

_WORDS = (
    "amber basalt cedar delta ember fjord garnet harbor iris juniper kelp "
    "lumen maple nectar onyx pebble quartz rowan sable tundra umber vellum "
    "willow xenon yarrow zephyr"
).split()


def _rng(seed: int, *scope) -> np.random.Generator:
    h = hashlib.sha256(("|".join(map(str, scope)) + f"|{seed}").encode()).digest()
    return np.random.default_rng(int.from_bytes(h[:8], "little"))


def _caption(seed: int, idx: int) -> str:
    r = _rng(seed, "caption", idx)
    words = [_WORDS[i] for i in r.integers(0, len(_WORDS), size=4)]
    return f"caption {idx:06d} " + " ".join(words)


def _image(seed: int, idx: int) -> tuple[np.ndarray, str]:
    r = _rng(seed, "image", idx)
    w = int(r.integers(8, 65))
    h = int(r.integers(8, 65))
    yy, xx = np.mgrid[0:h, 0:w]
    base = (
        128
        + 100 * np.sin(xx / max(1, w) * np.pi * r.uniform(0.5, 3))
        + 60 * np.cos(yy / max(1, h) * np.pi * r.uniform(0.5, 3))
    )
    img = np.zeros((h, w, 3))
    for c in range(3):
        img[:, :, c] = base * r.uniform(0.5, 1.0) + r.normal(0, 8, size=(h, w))
    img = np.clip(img, 0, 255).astype(np.uint8)
    fmt = "jpeg" if r.random() < 0.4 else "png"
    return img, fmt


def _corpus_chunk(seed: int, idx_urls: list[tuple[int, str]]) -> dict[str, list]:
    rows: dict[str, list] = {
        k: [] for k in ("image_id", "bytes", "w", "h", "fmt", "caption", "phash")
    }
    for i, url in idx_urls:
        img, fmt = _image(seed, i)
        data = encode(img, fmt, quality=92)
        decoded = decode(data, fmt)
        rows["image_id"].append(url)
        rows["bytes"].append(data)
        rows["w"].append(img.shape[1])
        rows["h"].append(img.shape[0])
        rows["fmt"].append(fmt)
        rows["caption"].append(_caption(seed, i))
        rows["phash"].append(phash64(decoded))
    return rows


def generate(out_dir: str, tier: str = "t2", seed: int = 42) -> dict[str, str]:
    """Generate (or reuse cached) fixture parquet under out_dir. Returns
    {"web": path, "corpus": path, "robots": path}."""
    cfg = TIERS[tier]
    os.makedirs(out_dir, exist_ok=True)
    manifest = os.path.join(out_dir, "manifest.json")
    paths = {t: os.path.join(out_dir, f"{t}.parquet") for t in ("web", "corpus", "robots")}
    # version 6: LJPG DCT einsum→matmul (float summation order changed;
    # cached corpora must be regenerated so stored phash stays
    # self-consistent with decode)
    want = {"tier": tier, "seed": seed, "version": 6}
    if os.path.exists(manifest):
        try:
            with open(manifest) as f:
                if json.load(f) == want and all(os.path.exists(p) for p in paths.values()):
                    return paths
        except (json.JSONDecodeError, OSError):
            pass

    n_pages, n_hosts = cfg["pages"], cfg["hosts"]
    master = _rng(seed, "master", tier)

    # Zipf-skewed page counts per host (hot host 0).
    weights = 1.0 / np.arange(1, n_hosts + 1) ** 1.2
    weights /= weights.sum()
    counts = np.maximum(1, np.floor(weights * n_pages).astype(int))
    while counts.sum() < n_pages:
        counts[0] += 1

    hosts = [f"host{i}.test" for i in range(n_hosts)]
    urls: list[str] = []
    url_host: list[str] = []
    for hi, host in enumerate(hosts):
        for j in range(counts[hi]):
            urls.append(f"https://{host}/p/{j}")
            url_host.append(host)
    n = len(urls)
    url_set = set(urls)

    status = np.full(n, 200, dtype=np.int32)
    r = _rng(seed, "status")
    roll = r.random(n)
    status[roll < 0.05] = 301
    status[(roll >= 0.05) & (roll < 0.12)] = 404
    status[(roll >= 0.12) & (roll < 0.15)] = 500
    # seeds (page 0 of each host) always fetchable
    url_idx = {u: i for i, u in enumerate(urls)}
    for hi, host in enumerate(hosts):
        status[url_idx[f"https://{host}/p/0"]] = 200

    latency = _rng(seed, "latency").integers(5, 200, size=n).astype(np.int32)
    slow = _rng(seed, "slow").random(n) < 0.01
    latency[slow] = 90_000  # > default 60 s request_timeout → TimedOut path

    redirect_to = [None] * n
    links: list[list[str]] = [[] for _ in range(n)]
    canonical = [None] * n
    image_id = [None] * n

    by_host: dict[str, list[int]] = {}
    for i, h in enumerate(url_host):
        by_host.setdefault(h, []).append(i)

    for i, url in enumerate(urls):
        host = url_host[i]
        r = _rng(seed, "page", i)
        if status[i] == 301:
            peers = by_host[host]
            target = urls[peers[int(r.integers(0, len(peers)))]]
            redirect_to[i] = target
            continue
        if status[i] != 200:
            continue
        # intra-host links: mix of relative and absolute forms
        peers = by_host[host]
        k = int(r.integers(2, 9))
        picks = r.integers(0, len(peers), size=k)
        raw_links = []
        for p in picks:
            tgt = urls[peers[int(p)]]
            form = r.random()
            path = tgt.split(".test", 1)[1]
            if form < 0.5:
                raw_links.append(path)  # absolute path
            elif form < 0.7:
                raw_links.append(tgt)  # full URL
            elif form < 0.85:
                raw_links.append(path + "?utm_source=feed")  # tracking param
            else:
                raw_links.append(path + "#sec")  # fragment-bearing
        # cross-host links
        if r.random() < 0.35:
            other = hosts[int(r.integers(0, n_hosts))]
            raw_links.append(f"https://{other}/p/{int(r.integers(0, 5))}")
        # garbage links exercising checked_join rejections
        if r.random() < 0.4:
            raw_links.append(r.choice(["#top", "mailto:x@y.z", "", "ftp://z/q"]))
        if r.random() < 0.3:
            raw_links.append("https://offsite.example/else")
        # disallowed path (robots) on hot host
        if host == "host0.test" and r.random() < 0.2:
            raw_links.append("/private/x" + str(int(r.integers(0, 10))))
        links[i] = raw_links
        if r.random() < 0.15:
            canonical[i] = f"https://{host}/p/{int(r.integers(0, len(peers)))}"
        image_id[i] = url

    # corpus for every 200-page; image synthesis is per-(seed, idx)
    # deterministic, so large tiers fan out over Ray tasks when a session
    # is live (the xl tier is ~170k images ≈ minutes of serial work).
    idx_urls = [(i, url) for i, url in enumerate(urls) if image_id[i] is not None]
    chunks = [idx_urls[i : i + 2000] for i in range(0, len(idx_urls), 2000)]
    try:
        import ray

        use_ray = ray.is_initialized() and len(idx_urls) > 10_000
    except ImportError:
        use_ray = False
    if use_ray:
        fn = ray.remote(_corpus_chunk)
        chunk_rows = ray.get([fn.remote(seed, c) for c in chunks])
    else:
        chunk_rows = [_corpus_chunk(seed, c) for c in chunks]
    corpus_rows = {k: [] for k in ("image_id", "bytes", "w", "h", "fmt", "caption", "phash")}
    for rows in chunk_rows:
        for k in corpus_rows:
            corpus_rows[k].extend(rows[k])

    corpus = pa.table(
        {
            "image_id": pa.array(corpus_rows["image_id"], pa.string()),
            "bytes": pa.array(corpus_rows["bytes"], pa.binary()),
            "w": pa.array(corpus_rows["w"], pa.int32()),
            "h": pa.array(corpus_rows["h"], pa.int32()),
            "fmt": pa.array(corpus_rows["fmt"], pa.string()),
            "caption": pa.array(corpus_rows["caption"], pa.string()),
            "phash": pa.array(corpus_rows["phash"], pa.int64()),
        }
    )
    web = pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "host": pa.array(url_host, pa.string()),
            "status_code": pa.array(status, pa.int32()),
            "redirect_to": pa.array(redirect_to, pa.string()),
            "links": pa.array(links, pa.list_(pa.string())),
            "canonical": pa.array(canonical, pa.string()),
            "image_id": pa.array(image_id, pa.string()),
            "latency_ms": pa.array(latency, pa.int32()),
        }
    )

    robots_txt = []
    for hi, host in enumerate(hosts):
        r = _rng(seed, "robots", hi)
        if hi == 0:
            # The hot host always has robots (exercises Disallow + delay).
            # The bench tier omits Crawl-delay: with ~23% of all pages on
            # this host, a 10 ms serialized delay makes the whole crawl
            # politeness-bound and the benchmark would measure sleeps,
            # not the engine (politeness enforcement itself is still on
            # and covered by the t1/t2 semantic tiers).
            delay = "" if tier.startswith("bench") else "Crawl-delay: 0.01\n"
            robots_txt.append(
                "User-Agent: grapeshot\nDisallow: /\n\n"
                f"User-Agent: *\nDisallow: /private/\n{delay}"
            )
        elif r.random() < 0.2:
            robots_txt.append(None)  # 404 robots
        else:
            body = "User-Agent: *\n"
            if r.random() < 0.3:
                body += "Disallow: /p/1*\n" if r.random() < 0.5 else "Disallow: /x/\n"
            robots_txt.append(body)
    robots = pa.table(
        {
            "host": pa.array(hosts, pa.string()),
            "robots_txt": pa.array(robots_txt, pa.string()),
        }
    )

    pq.write_table(web, paths["web"])
    pq.write_table(corpus, paths["corpus"])
    pq.write_table(robots, paths["robots"])
    with open(manifest, "w") as f:
        json.dump(want, f)
    return paths


def render_page(url: str, links: list[str], canonical, caption, image_id) -> str:
    """Deterministic HTML body for a 200 response (the synthetic server)."""
    link_html = "\n".join(f'<a href="{l}">link</a>' for l in links if l is not None)
    canon = f'<link rel="canonical" href="{canonical}">' if canonical else ""
    img = f'<img src="{image_id}" alt="payload">' if image_id else ""
    cap = f'<p class="caption">{caption}</p>' if caption else ""
    return (
        f"<html><head><title>Page {url}</title>{canon}</head>"
        f"<body><h1>{url}</h1>{img}{cap}\n{link_html}\n</body></html>"
    )
