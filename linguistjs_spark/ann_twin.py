"""Pure-Python twins of the ANN / SimHash query results, for the DuckDB
correctness oracles of queries whose hash-domain state (xxhash64 sketches,
LSH planes, quantized k-means) cannot be restated in SQL.

Everything here recomputes the EXPECTED query output independently of Spark
(pyarrow + the hash twins), replicating the Column-expression arithmetic
bit-for-bit:

  - dot products fold LEFT-TO-RIGHT like F.aggregate (NumPy's pairwise
    summation would differ in final ulps and flip near-ties);
  - cosine uses the shared dot/sqrt(dot*dot) formulation;
  - F.round is HALF_UP (away from zero), not banker's rounding;
  - greatest(struct(score, cid)) tie-breaks to the HIGHER cid;
  - the k-means per-dimension mean uses the same fixed-point quantization
    as similarity.ivf_centroids.

__spark_entry__.oracle_sql() formats these expected rows into literal
VALUES SQL; tests/test_ann_twin.py pins each twin against the live Spark
query at sf0.001.
"""

from __future__ import annotations

import math

from .hash_twin import oracle_hyperplane_bucket, oracle_shingles, oracle_simhash


def _read_parquet_rows(path: str, columns: list[str]) -> list[tuple]:
    import pyarrow.parquet as pq

    t = pq.read_table(path, columns=columns)
    cols = [t.column(c).to_pylist() for c in columns]
    return list(zip(*cols))


def load_embeddings(sf_dir: str) -> list[tuple[int, list[float]]]:
    rows = _read_parquet_rows(f"{sf_dir}/embeddings.parquet", ["vec_id", "embedding"])
    out = sorted((int(i), [float(x) for x in v]) for i, v in rows)
    return out


def _dot(a: list[float], b: list[float]) -> float:
    acc = 0.0
    for x, y in zip(a, b):
        acc = acc + x * y
    return acc


def _cosine(a: list[float], b: list[float]) -> float:
    sq = _dot(a, a) * _dot(b, b)
    return _dot(a, b) / math.sqrt(sq) if sq > 0 else 0.0


def round_half_up(x: float, digits: int = 4) -> float:
    scale = 10.0 ** digits
    if x >= 0:
        return math.floor(x * scale + 0.5) / scale
    return math.ceil(x * scale - 0.5) / scale


def lsh_topk_expected(
    sf_dir: str, query_id: int, k: int = 10, bits: int = 8, probe_hamming: int = 2
) -> list[tuple[int, float]]:
    """similarity.lsh_topk twin: (vec_id, round(score, 4)) rows."""
    emb = load_embeddings(sf_dir)
    qvec = dict(emb)[query_id]
    qbucket = oracle_hyperplane_bucket(qvec, bits)
    scored = []
    for vid, vec in emb:
        b = oracle_hyperplane_bucket(vec, bits)
        if bin(b ^ qbucket).count("1") <= probe_hamming:
            scored.append((vid, _cosine(vec, qvec)))
    scored.sort(key=lambda t: (-t[1], t[0]))
    return [(vid, round_half_up(s)) for vid, s in scored[:k]]


def _ivf_centroids_twin(
    emb: list[tuple[int, list[float]]], n_centroids: int, iters: int
) -> list[tuple[int, list[float]]]:
    """similarity.ivf_centroids twin (quantized-sum Lloyd iterations)."""
    cents = [(i, list(vec)) for i, (_, vec) in enumerate(emb[:n_centroids])]
    scale = float(1 << 24)

    def q(x: float) -> int:
        return int(math.floor(x * scale + 0.5)) if x >= 0 else int(
            math.ceil(x * scale - 0.5)
        )

    for _ in range(iters):
        acc: dict[int, tuple[list[int], int]] = {}
        for _, vec in emb:
            best = max(
                (( _cosine(vec, cvec), cid) for cid, cvec in cents)
            )
            cid = best[1]
            if cid not in acc:
                acc[cid] = ([0] * len(vec), 0)
            sums, n = acc[cid]
            for d, x in enumerate(vec):
                sums[d] += q(x)
            acc[cid] = (sums, n + 1)
        new = []
        for cid, vec in cents:
            if cid not in acc:
                new.append((cid, vec))
                continue
            sums, n = acc[cid]
            new.append((cid, [sums[d] / scale / n for d in range(len(vec))]))
        cents = new
    return cents


def ivf_topk_expected(
    sf_dir: str, query_id: int, k: int = 10, n_centroids: int = 16,
    n_probe: int = 4, iters: int = 5,
) -> list[tuple[int, float]]:
    """similarity.ivf_centroids + with_ivf_buckets + ivf_topk twin."""
    emb = load_embeddings(sf_dir)
    qvec = dict(emb)[query_id]
    cents = _ivf_centroids_twin(emb, n_centroids, iters)

    # probe selection is SHARED with the engine (similarity.select_probes)
    # so the tie-break is pinned in one place; in both the engine and this
    # twin it is driver-side python over the tiny centroid list, so sharing
    # it does not weaken the twin's independence on the distributed part
    # (assignment + scoring below stay independently written)
    from .operators.similarity import select_probes

    probe_ids = set(select_probes(cents, qvec, n_probe))

    scored = []
    for vid, vec in emb:
        assigned = max(((_cosine(vec, cvec), cid) for cid, cvec in cents))[1]
        if assigned in probe_ids:
            scored.append((vid, _cosine(vec, qvec)))
    scored.sort(key=lambda t: (-t[1], t[0]))
    return [(vid, round_half_up(s)) for vid, s in scored[:k]]


def simhash_pairs_expected(
    sf_dir: str, max_hamming: int = 3
) -> list[tuple[int, int, int]]:
    """dedup.with_simhash + simhash_near_pairs twin: EXHAUSTIVE hamming<=k
    pairs — also proves the 16-bit-slice pigeonhole join loses nothing."""
    rows = _read_parquet_rows(f"{sf_dir}/documents.parquet", ["doc_id", "text"])
    sims = sorted(
        (int(i), oracle_simhash(oracle_shingles(t or "", 3))) for i, t in rows
    )
    out = []
    for i in range(len(sims)):
        for j in range(i + 1, len(sims)):
            a, ha = sims[i]
            b, hb = sims[j]
            d = bin((ha ^ hb) & ((1 << 64) - 1)).count("1")
            if d <= max_hamming:
                out.append((a, b, d))
    return sorted(out)


def image_near_dup_expected(
    n: int = 64, plant: int = 6, max_hamming: int = 3
) -> list[tuple[int, int, int]]:
    """multimodal.image_near_dup twin (fake decode): EXHAUSTIVE hamming<=k
    aHash pairs over the synthetic fixture's image rows — also proves the
    16-bit-slice pigeonhole join loses nothing. Regenerates the fixture
    payloads arithmetically (multimodal.synthetic_media_df's contract) and
    recomputes the byte-cycled average hash independently."""
    payloads: dict[int, bytes] = {}
    for i in range(n):
        if i % 3 == 0:  # image rows of the base fixture
            payloads[i] = bytes(
                (i * 7 + j) % 256 for j in range(32 + i % 100)
            )
    for p in range(plant):
        base = bytes(245 if (j >> (p % 6)) & 1 else 10 for j in range(64))
        tw = bytearray(base)
        pos = p % 64
        tw[pos] = 10 if base[pos] == 245 else 245
        payloads[1000 + 2 * p] = base
        payloads[1001 + 2 * p] = bytes(tw)

    def ahash(data: bytes) -> int:
        data = data or b"\x00"
        px = [data[j % len(data)] for j in range(64)]
        mean = sum(px) / 64
        h = 0
        for j, v in enumerate(px):
            if v > mean:
                h |= 1 << j
        return h

    hs = sorted((i, ahash(b)) for i, b in payloads.items())
    out = []
    for x in range(len(hs)):
        for y in range(x + 1, len(hs)):
            a, ha = hs[x]
            b, hb = hs[y]
            d = bin(ha ^ hb).count("1")
            if d <= max_hamming:
                out.append((a, b, d))
    return sorted(out)


def semantic_dedup_expected(
    sf_dir: str, n_centroids: int = 8, threshold: float = 0.95,
    iters: int = 5, plant_below: int = 8, plant_offset: int = 1_000_000,
    plant_scale: float = 1.25,
) -> list[tuple[int, int, bool, int | None]]:
    """similarity.semantic_dedup twin over the planted-near-dup corpus that
    q_semantic_dedup builds (scaled copies of vec_id < plant_below at
    id + plant_offset; the scale factor is a power-of-two fraction so the
    planting multiplication is exact in both engines). Returns
    (vec_id, centroid, keep, dup_of) rows, dup_of None when kept."""
    emb = load_embeddings(sf_dir)
    planted = [
        (vid + plant_offset, [x * plant_scale for x in vec])
        for vid, vec in emb if vid < plant_below
    ]
    allv = sorted(emb + planted)
    # quantizer trains on the SAME union the query feeds the engine's
    # ivf_centroids (init = lowest-id vectors, unaffected by high-id plants)
    cents = _ivf_centroids_twin(allv, n_centroids, iters)
    assigned = [
        (vid, max(((_cosine(vec, cvec), cid) for cid, cvec in cents))[1], vec)
        for vid, vec in allv
    ]
    by_cluster: dict[int, list[tuple[int, list[float]]]] = {}
    for vid, cid, vec in assigned:
        by_cluster.setdefault(cid, []).append((vid, vec))
    dup_of: dict[int, int] = {}
    for members in by_cluster.values():
        members.sort()
        for j in range(1, len(members)):
            for i in range(j):
                if _cosine(members[i][1], members[j][1]) >= threshold:
                    dup_of[members[j][0]] = members[i][0]
                    break
    return [
        (vid, cid, vid not in dup_of, dup_of.get(vid))
        for vid, cid, _ in assigned
    ]


def margin_knn_expected(
    sf_dir: str,
    k: int = 4,
    threshold: float = 1.05,
    bits: int = 8,
    probe_hamming: int = 1,
    plant_below: int = 40,
    plant_offset: int = 1_000_000,
    plant_scale: float = 1.25,
) -> list[tuple[int, int, float, float]]:
    """similarity.margin_knn_pairs twin over q_bitext_mining's fixture:
    src = even vec_ids, tgt = odd vec_ids plus planted "translations"
    (plant_scale-scaled copies of src vec_id < plant_below at
    id + plant_offset; the scale is a power-of-two fraction so planting is
    exact in both engines). Candidate rule: bucket hamming <=
    min(probe_hamming, 1) — the engine's probe fan-out XORs single bits,
    so forward ∪ backward probing admits exactly the hamming<=1 pairs.
    kNN half-averages fold in (cos asc, id asc) order to mirror the
    engine's sort_array left fold bit-for-bit. Returns mutual-best
    (src_id, tgt_id, round(cos,4), round(margin,4)) rows with
    margin >= threshold."""
    emb = load_embeddings(sf_dir)
    src = [(vid, vec) for vid, vec in emb if vid % 2 == 0]
    tgt = [(vid, vec) for vid, vec in emb if vid % 2 == 1]
    tgt += [
        (vid + plant_offset, [x * plant_scale for x in vec])
        for vid, vec in src if vid < plant_below
    ]
    sb = {vid: oracle_hyperplane_bucket(vec, bits) for vid, vec in src}
    tb = {vid: oracle_hyperplane_bucket(vec, bits) for vid, vec in tgt}
    sv, tv = dict(src), dict(tgt)
    ham = min(probe_hamming, 1)
    cand = [
        (x, y)
        for x in sb for y in tb
        if bin(sb[x] ^ tb[y]).count("1") <= ham
    ]
    cos = {(x, y): _cosine(sv[x], tv[y]) for x, y in cand}

    def half_avgs(key_idx: int) -> dict[int, float]:
        other_idx = 1 - key_idx
        by: dict[int, list[int]] = {}
        for e in cand:
            by.setdefault(e[key_idx], []).append(e[other_idx])

        def pair_cos(kk: int, o: int) -> float:
            return cos[(kk, o)] if key_idx == 0 else cos[(o, kk)]

        out = {}
        for kk, others in by.items():
            others.sort(key=lambda o: (-pair_cos(kk, o), o))
            ns = sorted((pair_cos(kk, o), o) for o in others[:k])
            s = 0.0
            for sc, _ in ns:
                s = s + sc
            out[kk] = s / (2.0 * len(ns))
        return out

    hx = half_avgs(0)
    hy = half_avgs(1)
    margins: dict[tuple[int, int], float] = {}
    for (x, y) in cand:
        d = hx[x] + hy[y]
        if d > 0:
            margins[(x, y)] = cos[(x, y)] / d
    best_f: dict[int, tuple[int, float]] = {}
    best_b: dict[int, tuple[int, float]] = {}
    for (x, y), mg in margins.items():
        c = best_f.get(x)
        if c is None or mg > c[1] or (mg == c[1] and y < c[0]):
            best_f[x] = (y, mg)
        c = best_b.get(y)
        if c is None or mg > c[1] or (mg == c[1] and x < c[0]):
            best_b[y] = (x, mg)
    out = []
    for x, (y, mg) in sorted(best_f.items()):
        if best_b.get(y, (None, 0.0))[0] == x and mg >= threshold:
            out.append(
                (x, y, round_half_up(cos[(x, y)]), round_half_up(mg)))
    return sorted(out)
