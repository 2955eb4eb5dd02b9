from __future__ import annotations

from proto_to_avro_ql_spark.operators import simsearch as SS
from proto_to_avro_ql_spark.sources.io import read_table


class TestBruteForce:
    def test_topk_shape_and_order(self, spark, sf_dir):
        emb = read_table(spark, sf_dir, "embeddings")
        out = SS.brute_force_topk(emb, query_ids=[0, 1], k=3).collect()
        by_q = {}
        for r in out:
            by_q.setdefault(r.query_id, []).append(r)
        for q, rows in by_q.items():
            assert len(rows) == 3
            sims = [r.cos_sim for r in sorted(rows, key=lambda r: r.rank)]
            assert sims == sorted(sims, reverse=True)
            assert all(r.neighbor_id != q for r in rows)

    def test_self_similarity_excluded_and_bounded(self, spark, sf_dir):
        emb = read_table(spark, sf_dir, "embeddings")
        out = SS.brute_force_topk(emb, query_ids=[5], k=10).collect()
        assert all(-1.0 <= r.cos_sim <= 1.0 for r in out)


class TestLsh:
    def test_lsh_recall_vs_brute_force(self, spark, sf_dir):
        emb = read_table(spark, sf_dir, "embeddings")
        exact = SS.brute_force_topk(emb, query_ids=[0, 1, 2], k=5).collect()
        approx = SS.lsh_topk(emb, query_ids=[0, 1, 2], k=5, planes=2).collect()
        exact_set = {(r.query_id, r.neighbor_id) for r in exact}
        approx_set = {(r.query_id, r.neighbor_id) for r in approx}
        # with 2 planes (4 buckets) recall should be substantial
        assert len(approx_set & exact_set) / len(exact_set) >= 0.4
        # every approx hit must carry the exact cosine (scores aren't approximated)
        exact_scores = {(r.query_id, r.neighbor_id): r.cos_sim for r in exact}
        for r in approx:
            if (r.query_id, r.neighbor_id) in exact_scores:
                assert abs(r.cos_sim - exact_scores[(r.query_id, r.neighbor_id)]) < 1e-9


class TestIvf:
    def test_ivf_recall_and_exact_scores(self, spark, sf_dir):
        emb = read_table(spark, sf_dir, "embeddings")
        exact = SS.brute_force_topk(emb, query_ids=[0, 1, 2], k=5).collect()
        approx = SS.ivf_topk(emb, query_ids=[0, 1, 2], k=5, probes=3).collect()
        exact_set = {(r.query_id, r.neighbor_id) for r in exact}
        approx_set = {(r.query_id, r.neighbor_id) for r in approx}
        assert len(approx_set & exact_set) / len(exact_set) >= 0.4
        scores = {(r.query_id, r.neighbor_id): r.cos_sim for r in exact}
        for r in approx:
            if (r.query_id, r.neighbor_id) in scores:
                assert abs(r.cos_sim - scores[(r.query_id, r.neighbor_id)]) < 1e-9

    def test_kmeans_cells(self, spark, sf_dir):
        emb = read_table(spark, sf_dir, "embeddings")
        assigned = SS.kmeans_cells(emb, k=8).collect()
        assert len(assigned) == emb.count()  # every vector assigned
        cells = {r.cell for r in assigned}
        assert 1 < len(cells) <= 8
        assert all(len(r.centroid) == 64 for r in assigned)


class TestSemanticDedup:
    def test_greedy_lower_id_wins_within_cell_only(self, spark):
        """Identical vectors in the SAME cell dedup to the lowest id;
        an identical vector in ANOTHER cell is untouched (cell-scoped
        by design — cross-cell dups are the clustering's recall miss,
        exactly the SemDeDup trade)."""
        from proto_to_avro_ql_spark.operators.simsearch import semantic_dedup_cells

        emb = spark.createDataFrame(
            [
                (1, [1.0, 0.0], 0),
                (2, [1.0, 0.0], 0),   # dup of 1, same cell -> dropped
                (3, [0.0, 1.0], 0),   # orthogonal -> kept
                (4, [1.0, 0.0], 1),   # dup of 1, other cell -> kept
            ],
            "vec_id long, embedding array<float>, label int",
        )
        kept = {r.vec_id for r in semantic_dedup_cells(emb, threshold=0.9).collect()}
        assert kept == {1, 3, 4}

    def test_empty_input(self, spark):
        from proto_to_avro_ql_spark.operators.simsearch import semantic_dedup_cells

        empty = spark.createDataFrame(
            [], "vec_id long, embedding array<float>, label int"
        )
        assert semantic_dedup_cells(empty).count() == 0


class TestHybridSearch:
    def test_rrf_fuses_both_rankings(self, spark, sf_dir):
        """Every output row carries at least one non-zero branch rank;
        a doc ranked by BOTH branches must out-score a doc ranked the
        same by only one (the RRF property)."""
        from proto_to_avro_ql_spark.entry_queries import QUERIES

        rows = QUERIES["ext_hybrid_search"](spark, sf_dir).collect()
        assert 0 < len(rows) <= 10
        assert all(r.lex_rank > 0 or r.vec_rank > 0 for r in rows)
        # monotone: output is sorted by fused score then id
        scores = [r.rrf for r in rows]
        assert scores == sorted(scores, reverse=True) or len(set(scores)) < len(scores)
        for r in rows:
            expect = (1.0 / (60 + r.lex_rank) if r.lex_rank else 0.0) + (
                1.0 / (60 + r.vec_rank) if r.vec_rank else 0.0
            )
            assert abs(r.rrf - expect) < 1e-6


class TestIntegerGridVariants:
    """Round 8: the oracled integer-grid variants must keep the
    QUALITY the float variants promised — the DuckDB oracle proves
    cross-engine exactness, these prove the answers are still good.
    Embeddings are unit-normalized (probed: all L2 norms 1.0), so
    integer squared-L2 ranking == cosine ranking up to quantization."""

    def test_ivf_int_recall_vs_brute_force(self, spark, sf_dir):
        from proto_to_avro_ql_spark.operators import simsearch as SS
        from proto_to_avro_ql_spark.sources.io import read_table

        emb = read_table(spark, sf_dir, "embeddings")
        exact = SS.brute_force_topk(emb, query_ids=[0, 1, 2], k=5).collect()
        approx = SS.ivf_topk_int(emb, query_ids=[0, 1, 2], k=5, probes=3).collect()
        es = {(r.query_id, r.neighbor_id) for r in exact}
        a = {(r.query_id, r.neighbor_id) for r in approx}
        # observed 0.93 at sf0.001/0.01; bound leaves probe-miss room
        assert len(es & a) / len(es) >= 0.4, (len(es & a), len(es))

    def test_kmeans_int_assigns_every_vector(self, spark, sf_dir):
        from pyspark.sql import functions as F

        from proto_to_avro_ql_spark.operators import simsearch as SS
        from proto_to_avro_ql_spark.sources.io import read_table

        emb = read_table(spark, sf_dir, "embeddings")
        assigned = SS.kmeans_cells_int(emb, k=8, iters=2)
        assert assigned.count() == emb.count()
        cells = [r.cell for r in assigned.select("cell").distinct().collect()]
        assert 1 < len(cells) <= 8 and all(0 <= c < 8 for c in cells)
        bad = assigned.where(F.size("cv") != 64).count()
        assert bad == 0

    def test_pq_int_recall_vs_brute_force(self, spark, sf_dir):
        from proto_to_avro_ql_spark.operators import simsearch as SS
        from proto_to_avro_ql_spark.sources.io import read_table

        emb = read_table(spark, sf_dir, "embeddings")
        qids = [3, 17, 41, 77, 101, 150, 200, 260, 333, 444]
        pq = SS.pq_adc_topk_int(emb, qids, k=5, m=16, k_codes=32, iters=2).collect()
        assert len(pq) == 5 * len(qids)
        bf = SS.brute_force_topk(emb, qids, k=5).collect()
        b = {(r["query_id"], r["neighbor_id"]) for r in bf}
        p = {(r["query_id"], r["neighbor_id"]) for r in pq}
        # observed 0.34 (sf0.001) / 0.48 (sf0.01); random baseline ~0.01
        assert len(b & p) / len(b) >= 0.2, (len(b & p), len(b))


class TestSemDedup:
    def test_matches_python_reference(self, spark):
        """Third implementation of the SemDeDup chain: ref_kmeans
        (plain Lloyd's on quantized vectors) + per-cluster cosine in
        plain Python, compared row-for-row to ext_semdedup_kmeans."""
        import duckdb
        import math

        from proto_to_avro_ql_spark.entry_queries import QUERIES
        from tests.test_portable_reference import ref_kmeans, ref_quant

        sf = "/root/testdata/sf0.001"
        rows = (
            duckdb.connect()
            .execute(f"SELECT vec_id, embedding FROM '{sf}/embeddings.parquet' ORDER BY vec_id")
            .fetchall()
        )
        raw = {int(vid): [float(x) for x in v] for vid, v in rows}
        assign, _ = ref_kmeans({v: ref_quant(x) for v, x in raw.items()}, 8, 2)
        by_cell: dict[int, list[int]] = {}
        for vid, cell in assign.items():
            by_cell.setdefault(cell, []).append(vid)

        def cos(a, b):
            dot = sum(x * y for x, y in zip(a, b))
            na = math.sqrt(sum(x * x for x in a))
            nb = math.sqrt(sum(x * x for x in b))
            return round(dot / (na * nb), 6)

        dups = set()
        for cell, ids in by_cell.items():
            ids.sort()
            for j, b in enumerate(ids):
                for a in ids[:j]:
                    if cos(raw[a], raw[b]) >= 0.2:
                        dups.add(b)
                        break
        expect = {
            vid: (assign[vid], 1 if vid in dups else 0) for vid in raw
        }
        got = {
            r["vec_id"]: (r["cell"], r["is_dup"])
            for r in QUERIES["ext_semdedup_kmeans"](spark, sf).collect()
        }
        assert got == expect
        # The bucketing must actually dedup something and keep something.
        n_dup = sum(d for _, d in got.values())
        assert 0 < n_dup < len(got)


class TestMMRSelect:
    def test_matches_sequential_python_greedy(self, spark):
        """Third implementation of MMR: the paper's sequential greedy
        in plain Python over the same quantized vectors — and the
        diversity property (MMR's picks are pairwise farther apart
        than plain top-k's)."""
        import math

        import duckdb as _d

        from proto_to_avro_ql_spark.entry_queries import QUERIES

        SF = "/root/testdata/sf0.001"
        rows = (
            _d.connect()
            .execute(
                f"SELECT vec_id, embedding FROM '{SF}/embeddings.parquet'"
            )
            .fetchall()
        )
        from proto_to_avro_ql_spark.functions.portable import VEC_SCALE

        vq = {
            vid: [int(math.floor(float(x) * VEC_SCALE)) for x in emb]
            for vid, emb in rows
        }
        qv = vq[0]

        def d2(a, b):
            return sum((x - y) * (x - y) for x, y in zip(a, b))

        cand = {vid: d2(v, qv) for vid, v in vq.items() if vid != 0}
        picks, div = [], {}
        for i in range(1, 9):
            if i == 1:
                vid = min(cand, key=lambda d: (cand[d], d))
                picks.append((i, vid, cand[vid], None))
            else:
                vid = max(cand, key=lambda d: (div[d] - cand[d], -d))
                picks.append((i, vid, cand[vid], div[vid]))
            sel_v = vq[vid]
            del cand[vid]
            div.pop(vid, None)
            for d in cand:
                nd = d2(vq[d], sel_v)
                div[d] = nd if d not in div else min(div[d], nd)
        expect = {p[0]: p[1:] for p in picks}
        got = {
            r["sel_rank"]: (r["vec_id"], r["rel_d2"], r["div_d2"])
            for r in QUERIES["ext_mmr_select"](spark, SF).collect()
        }
        assert got == expect
        # Diversity property: MMR's min pairwise distance beats the
        # plain relevance top-8's.
        mmr_ids = [v[0] for v in expect.values()]
        top8 = sorted(vq, key=lambda d: (d2(vq[d], qv), d))[1:9]

        def min_pair(ids):
            return min(
                d2(vq[a], vq[b])
                for i, a in enumerate(ids)
                for b in ids[i + 1 :]
            )

        assert min_pair(mmr_ids) > min_pair(top8)
