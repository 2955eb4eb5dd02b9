"""Independent-reference checks for the session's statistics/graph
operators: each result is recomputed with plain Python/numpy over the
collected sf0.001 data — a third implementation besides the Spark plan
and the DuckDB oracle, catching shared misunderstandings the
oracle-vs-engine compare cannot."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import pytest
from pyspark.sql import functions as F

from proto_to_avro_ql_spark.entry_queries import QUERIES
from proto_to_avro_ql_spark.sources.io import read_table


class TestGraphReferences:
    def test_triangle_count_matches_bruteforce(self, spark, sf_dir):
        li = (
            read_table(spark, sf_dir, "lineitem")
            .select("l_orderkey", "l_partkey")
            .distinct()
            .collect()
        )
        orders = defaultdict(set)
        for r in li:
            orders[r.l_orderkey].add(r.l_partkey)
        edges = set()
        for parts in orders.values():
            ps = sorted(parts)
            for i in range(len(ps)):
                for j in range(i + 1, len(ps)):
                    edges.add((ps[i], ps[j]))
        adj = defaultdict(set)
        for u, v in edges:
            adj[u].add(v)
            adj[v].add(u)
        tri = sum(
            1 for (u, v) in edges for w in adj[u] & adj[v] if v < w
        )
        row = QUERIES["ext_triangle_count"](spark, sf_dir).first()
        assert row.n_edges == len(edges)
        assert row.n_nodes == len(adj)
        assert row.n_triangles == tri

    def test_graph_jaccard_scores_match_bruteforce(self, spark, sf_dir):
        rows = QUERIES["ext_graph_jaccard"](spark, sf_dir).collect()
        li = (
            read_table(spark, sf_dir, "lineitem")
            .select("l_orderkey", "l_partkey")
            .distinct()
            .collect()
        )
        orders = defaultdict(set)
        for r in li:
            orders[r.l_orderkey].add(r.l_partkey)
        adj = defaultdict(set)
        for parts in orders.values():
            ps = sorted(parts)
            for i in range(len(ps)):
                for j in range(i + 1, len(ps)):
                    adj[ps[i]].add(ps[j])
                    adj[ps[j]].add(ps[i])
        for r in rows:
            inter = len(adj[r.u] & adj[r.v])
            union = len(adj[r.u] | adj[r.v])
            assert r.common_nbrs == inter
            assert r.jaccard_micro == inter * 1000000 // union


class TestStatisticsReferences:
    def _daily_cents(self, spark, sf_dir):
        rows = (
            read_table(spark, sf_dir, "events")
            .groupBy("event_type", F.col("ts").cast("date").alias("day"))
            .agg(
                F.round(F.sum(F.col("value").cast("decimal(38,6)")) * 100, 0)
                .cast("long")
                .alias("c")
            )
            .collect()
        )
        series = defaultdict(dict)
        for r in rows:
            series[r.event_type][r.day] = r.c
        return {k: [v[d] for d in sorted(v)] for k, v in series.items()}

    def test_autocorr_matches_numpy(self, spark, sf_dir):
        import numpy as np

        series = self._daily_cents(spark, sf_dir)
        got = {r.event_type: r for r in QUERIES["ext_autocorr"](spark, sf_dir).collect()}
        for t, xs in series.items():
            x, y = np.array(xs[:-1], dtype=float), np.array(xs[1:], dtype=float)
            ref = np.corrcoef(x, y)[0, 1]
            assert got[t].n_pairs == len(x)
            assert got[t].r1 == pytest.approx(ref, abs=1e-9)

    def test_cusum_matches_python(self, spark, sf_dir):
        series = self._daily_cents(spark, sf_dir)
        got = {r.event_type: r for r in QUERIES["ext_cusum"](spark, sf_dir).collect()}
        for t, xs in series.items():
            n, s_n = len(xs), sum(xs)
            best = max(
                ((abs(n * sum(xs[: k + 1]) - (k + 1) * s_n), k) for k in range(n)),
                key=lambda p: (p[0], -p[1]),
            )
            expect = (n * sum(xs[: best[1] + 1]) - (best[1] + 1) * s_n) / n
            assert got[t].cusum_cents == pytest.approx(expect, abs=1e-9)
            assert got[t].n_days == n

    def test_ks_matches_bruteforce(self, spark, sf_dir):
        from decimal import Decimal

        ev = (
            read_table(spark, sf_dir, "events")
            .where(F.col("event_type").isin("purchase", "click"))
            .select("event_type", "value")
            .collect()
        )
        a = sorted(
            int(Decimal(str(r.value)).quantize(Decimal("0.01")) * 100)
            for r in ev
            if r.event_type == "purchase"
        )
        b = sorted(
            int(Decimal(str(r.value)).quantize(Decimal("0.01")) * 100)
            for r in ev
            if r.event_type == "click"
        )
        na, nb = len(a), len(b)
        vals = sorted(set(a) | set(b))
        d_best = max(
            abs(
                nb * sum(1 for x in a if x <= v)
                - na * sum(1 for x in b if x <= v)
            )
            for v in vals
        )
        row = QUERIES["ext_ks_test"](spark, sf_dir).first()
        assert (row.na, row.nb) == (na, nb)
        assert row.d_scaled == d_best
        assert row.ks == pytest.approx(d_best / (na * nb), abs=1e-12)

    def test_gini_matches_python(self, spark, sf_dir):
        rows = (
            read_table(spark, sf_dir, "events")
            .groupBy("user_id")
            .agg(
                F.round(F.sum(F.col("value").cast("decimal(38,6)")) * 100, 0)
                .cast("long")
                .alias("c")
            )
            .collect()
        )
        xs = sorted(r.c for r in rows)
        n, sx = len(xs), sum(xs)
        s1 = sum((i + 1) * x for i, x in enumerate(xs))
        ref_gini = (2 * s1 - (n + 1) * sx) / (n * sx)
        row = QUERIES["ext_gini"](spark, sf_dir).first()
        assert row.n_users == n
        assert row.gini == pytest.approx(ref_gini, abs=1e-12)
        top = sum(xs[n - (n + 99) // 100 :])
        assert row.top1pct_share == pytest.approx(top / sx, abs=1e-12)

    def test_chi_square_close_to_float_reference(self, spark, sf_dir):
        docs = read_table(spark, sf_dir, "documents").select("lang", "source").collect()
        cells = Counter((r.lang, r.source) for r in docs)
        rt, ct = Counter(r.lang for r in docs), Counter(r.source for r in docs)
        n = len(docs)
        ref = sum(
            (cells.get((l, s), 0) - rt[l] * ct[s] / n) ** 2 / (rt[l] * ct[s] / n)
            for l in rt
            for s in ct
        )
        row = QUERIES["ext_chi_square"](spark, sf_dir).first()
        assert row.n == n
        assert row.dof == (len(rt) - 1) * (len(ct) - 1)
        # integer-micros floor quantization: within 1e-3 relative of the float stat
        assert row.chi2 == pytest.approx(ref, rel=2e-3)

    def test_js_divergence_bounds_and_float_reference(self, spark, sf_dir):
        from proto_to_avro_ql_spark.functions.text import normalize_text

        docs = (
            read_table(spark, sf_dir, "documents")
            .where(F.col("lang").isin("en", "fr"))
            .select("lang", normalize_text(F.col("text")).alias("t"))
            .collect()
        )
        ca, cb = Counter(), Counter()
        for r in docs:
            if not r.t:
                continue
            (ca if r.lang == "en" else cb).update(r.t.split(" "))
        na, nb = sum(ca.values()), sum(cb.values())
        ref = 0.0
        for w in set(ca) | set(cb):
            p, q = ca.get(w, 0) / na, cb.get(w, 0) / nb
            m = (p + q) / 2
            if p:
                ref += 0.5 * p * math.log(p / m)
            if q:
                ref += 0.5 * q * math.log(q / m)
        row = QUERIES["ext_js_divergence"](spark, sf_dir).first()
        assert (row.n_en, row.n_fr) == (na, nb)
        assert 0.0 <= row.jsd_nats <= math.log(2) + 1e-9
        assert row.jsd_nats == pytest.approx(ref, abs=5e-6)  # ln rounded to 6

    def test_calibration_ece_matches_float_reference(self, spark, sf_dir):
        from decimal import Decimal

        ev = (
            read_table(spark, sf_dir, "events")
            .where(F.col("value").isNotNull())
            .select("user_id", "value")
            .collect()
        )
        bins = defaultdict(lambda: [0, 0, 0])  # n, pos, sum_vc
        total = 0
        for r in ev:
            vc = int(Decimal(str(r.value)).quantize(Decimal("0.01")) * 100)
            b = min(vc // 5000, 9)
            bins[b][0] += 1
            bins[b][1] += r.user_id % 2
            bins[b][2] += vc
            total += 1
        ece_ref = sum(abs(pos * 50000 - svc) for (_, pos, svc) in bins.values()) / (
            total * 50000
        )
        rows = QUERIES["ext_calibration"](spark, sf_dir).collect()
        assert len(rows) == len(bins)
        for r in rows:
            n, pos, svc = bins[r.bin]
            assert r.n == n
            assert r.obs_rate == pytest.approx(pos / n, abs=1e-12)
            assert r.ece == pytest.approx(ece_ref, abs=1e-12)

    def test_class_balance_equalizes_to_min_class(self, spark, sf_dir):
        counts = {
            r.event_type: r["count"]
            for r in read_table(spark, sf_dir, "events")
            .groupBy("event_type")
            .count()
            .collect()
        }
        m = min(counts.values())
        rows = QUERIES["ext_class_balance"](spark, sf_dir).collect()
        assert len(rows) == len(counts)
        assert all(r.n_kept == m for r in rows)

    def test_survivorship_matches_pandas(self, spark, sf_dir):
        pdf = (
            read_table(spark, sf_dir, "events")
            .select("user_id", "ts", "event_id", "event_type", "value")
            .toPandas()
            .sort_values(["user_id", "ts", "event_id"])
        )
        got = {r.user_id: r for r in QUERIES["ext_survivorship"](spark, sf_dir).collect()}
        for uid, g in pdf.groupby("user_id"):
            r = got[uid]
            assert r.n_events == len(g)
            assert r.last_type == g.iloc[-1].event_type
            nn = g[g.value.notna()]
            if len(nn):
                assert r.last_value == pytest.approx(nn.iloc[-1].value)
            else:
                assert r.last_value is None


class TestLedgerInvariants:
    def test_attribution_reconciles_to_total_revenue(self, spark, sf_dir):
        """The integer ledger's defining property: per-channel
        attributed value sums EXACTLY (to the micro) to total purchase
        revenue — no float split could guarantee this."""
        ev = read_table(spark, sf_dir, "events")
        total_micros = (
            ev.where(F.col("event_type") == "purchase")
            .select(
                F.sum((F.col("value").cast("decimal(38,6)") * 1000000).cast("long"))
                .alias("t")
            )
            .first()
            .t
        )
        rows = QUERIES["ext_attribution"](spark, sf_dir).collect()
        attributed_micros = round(sum(r.attributed_value for r in rows) * 1e6)
        assert attributed_micros == total_micros

    def test_observe_metrics_match_direct_aggregation(self, spark, sf_dir):
        ev = read_table(spark, sf_dir, "events").where(F.col("value") > 100.0)
        direct = ev.agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.col("value").cast("decimal(38,6)")), 2)
            .cast("double")
            .alias("tv"),
        ).first()
        row = QUERIES["ext_observe_metrics"](spark, sf_dir).first()
        assert row.n_rows == direct.n
        assert row.total_value == direct.tv

    def test_snapshot_diff_partitions_the_union_of_keys(self, spark, sf_dir):
        """added+removed+changed+unchanged exactly covers old ∪ new."""
        rows = {r.status: r.n_docs for r in QUERIES["ext_snapshot_diff"](spark, sf_dir).collect()}
        docs = read_table(spark, sf_dir, "documents")
        n = docs.count()
        n_removed = docs.where(F.col("doc_id") % 17 == 0).count()
        n_added = docs.where(F.col("doc_id") % 19 == 0).count()
        n_changed = docs.where(
            (F.col("doc_id") % 17 != 0) & (F.col("doc_id") % 13 == 0)
        ).count()
        assert rows.get("removed", 0) == n_removed
        assert rows.get("added", 0) == n_added
        assert rows.get("changed", 0) == n_changed
        assert rows.get("unchanged", 0) == n - n_removed - n_changed


class TestSession5References:
    def test_corr_matrix_matches_numpy(self, spark, sf_dir):
        import numpy as np

        daily = (
            read_table(spark, sf_dir, "events")
            .groupBy("event_type", F.col("ts").cast("date").alias("day"))
            .agg(
                F.round(F.sum(F.col("value").cast("decimal(38,6)")) * 100, 0)
                .cast("long")
                .alias("c")
            )
            .collect()
        )
        by_type = defaultdict(dict)
        for r in daily:
            by_type[r.event_type][r.day] = r.c
        got = QUERIES["ext_corr_matrix"](spark, sf_dir).collect()
        assert len(got) == 10  # C(5,2) type pairs
        for r in got:
            a, b = by_type[r.type_a], by_type[r.type_b]
            days = sorted(set(a) & set(b))
            assert r.n_days == len(days)
            ref = np.corrcoef(
                [float(a[d]) for d in days], [float(b[d]) for d in days]
            )[0, 1]
            assert r.r == pytest.approx(ref, abs=1e-9)

    def test_dp_response_estimator_tracks_true_rate(self, spark, sf_dir):
        ev = read_table(spark, sf_dir, "events")
        truth = (
            ev.groupBy(F.col("ts").cast("date").alias("day"))
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(
                    F.when(F.col("event_type") == "purchase", 1).otherwise(0)
                ).alias("true_yes"),
            )
            .collect()
        )
        true_rate = {str(r.day): r.true_yes / r.n for r in truth}
        got = QUERIES["ext_dp_response"](spark, sf_dir).collect()
        assert len(got) == len(true_rate)
        # randomized response is noisy per-day; the AGGREGATE estimate
        # must track the true rate (std err ~ sqrt(3)/(2 sqrt(N)))
        n_total = sum(r.n for r in got)
        est_total = sum(r.est_yes for r in got)
        true_total = sum(r.true_yes for r in truth)
        se = 3**0.5 / 2 * n_total**0.5  # absolute count scale
        assert abs(est_total - true_total) < 4 * se
        # per-day estimates are unbiased but noisy: most within 4 sigma
        for r in got:
            day_se = 3**0.5 / 2 * r.n**0.5
            assert abs(r.est_yes - true_rate[r.day] * r.n) < 6 * day_se

    def test_seasonal_index_averages_to_one(self, spark, sf_dir):
        got = QUERIES["ext_seasonal_index"](spark, sf_dir).collect()
        by_type = defaultdict(list)
        for r in got:
            by_type[r.event_type].append(r)
        for t, rows in by_type.items():
            assert len(rows) == 7  # every weekday present
            # day-weighted mean of the index is 1 by construction
            n = sum(r.n_days for r in rows)
            m = sum(r.seasonal_index * r.n_days for r in rows) / n
            assert m == pytest.approx(1.0, abs=1e-3)

    def test_window_count_distinct_is_monotone_and_bounded(self, spark, sf_dir):
        rows = QUERIES["ext_window_count_distinct"](spark, sf_dir).collect()
        ev = {
            (r.event_id): r
            for r in read_table(spark, sf_dir, "events")
            .select("event_id", "user_id", "ts", "event_type")
            .collect()
        }
        per_user = defaultdict(list)
        for r in rows:
            e = ev[r.event_id]
            per_user[r.user_id].append((e.ts, r.event_id, r.n_types_seen, e.event_type))
        for u, seq in per_user.items():
            seq.sort()
            seen = set()
            for ts, eid, n, et in seq:
                seen.add(et)
                assert n == len(seen)

    def test_mann_whitney_matches_python(self, spark, sf_dir):
        import hashlib
        from decimal import Decimal

        rows = (
            read_table(spark, sf_dir, "events")
            .select("user_id", "value")
            .collect()
        )

        def bucket(uid):
            return int(hashlib.md5(str(uid).encode()).hexdigest()[:8], 16) % 2

        a = sorted(
            int(Decimal(repr(r.value)).quantize(Decimal("0.01")) * 100)
            for r in rows
            if bucket(r.user_id) == 0
        )
        b = sorted(
            int(Decimal(repr(r.value)).quantize(Decimal("0.01")) * 100)
            for r in rows
            if bucket(r.user_id) == 1
        )
        allv = sorted(a + b)
        # midranks
        from collections import Counter

        cnt = Counter(allv)
        below, midrank = {}, {}
        c = 0
        for v in sorted(cnt):
            below[v] = c
            midrank[v] = c + (cnt[v] + 1) / 2
            c += cnt[v]
        na, nb, n = len(a), len(b), len(allv)
        rb = sum(midrank[v] for v in b)
        u_ref = rb - nb * (nb + 1) / 2
        ties = sum(t**3 - t for t in cnt.values())
        var = na * nb / 12 * ((n + 1) - ties / (n * (n - 1)))
        z_ref = (u_ref - na * nb / 2) / var**0.5
        got = QUERIES["ext_mann_whitney"](spark, sf_dir).collect()[0]
        assert (got.na, got.nb) == (na, nb)
        assert got.u_b == pytest.approx(u_ref, abs=1e-9)
        assert got.z == pytest.approx(z_ref, rel=1e-12)

    def test_mutual_information_matches_python(self, spark, sf_dir):
        from collections import Counter

        docs = read_table(spark, sf_dir, "documents").select("lang", "source").collect()
        nxy = Counter((r.lang, r.source) for r in docs)
        nx = Counter(r.lang for r in docs)
        ny = Counter(r.source for r in docs)
        n = len(docs)
        ref = sum(
            c / n * math.log(n * c / (nx[l] * ny[s])) for (l, s), c in nxy.items()
        )
        got = QUERIES["ext_mutual_information"](spark, sf_dir).collect()[0]
        assert got.n_docs == n
        assert got.mi_nats == pytest.approx(ref, abs=5e-6)  # 6-dp rounded terms
        assert got.mi_nats >= 0 or abs(got.mi_nats) < 5e-6  # MI is nonnegative

    def test_kcore_matches_python_peeling(self, spark, sf_dir):
        li = (
            read_table(spark, sf_dir, "lineitem")
            .select("l_orderkey", "l_partkey")
            .distinct()
            .collect()
        )
        baskets = defaultdict(set)
        for r in li:
            baskets[r.l_orderkey].add(r.l_partkey)
        pair_count = Counter()
        for parts in baskets.values():
            ps = sorted(parts)
            for i in range(len(ps)):
                for j in range(i + 1, len(ps)):
                    pair_count[(ps[i], ps[j])] += 1
        cur = {p for p, c in pair_count.items() if c >= 2}
        while True:
            deg = Counter()
            for u, v in cur:
                deg[u] += 1
                deg[v] += 1
            keep = {n for n, d in deg.items() if d >= 3}
            nxt = {(u, v) for u, v in cur if u in keep and v in keep}
            if nxt == cur:
                break
            cur = nxt
        ref_deg = Counter()
        for u, v in cur:
            ref_deg[u] += 1
            ref_deg[v] += 1
        got = {r.id: r.core_degree for r in QUERIES["ext_kcore"](spark, sf_dir).collect()}
        assert got == dict(ref_deg)

    def test_freq_triples_apriori_consistent(self, spark, sf_dir):
        li = (
            read_table(spark, sf_dir, "lineitem")
            .select("l_orderkey", "l_partkey")
            .distinct()
            .collect()
        )
        baskets = defaultdict(set)
        for r in li:
            baskets[r.l_orderkey].add(r.l_partkey)
        triple_count = Counter()
        for parts in baskets.values():
            ps = sorted(parts)
            n = len(ps)
            for i in range(n):
                for j in range(i + 1, n):
                    for l in range(j + 1, n):
                        triple_count[(ps[i], ps[j], ps[l])] += 1
        pair_count = Counter()
        for parts in baskets.values():
            ps = sorted(parts)
            for i in range(len(ps)):
                for j in range(i + 1, len(ps)):
                    pair_count[(ps[i], ps[j])] += 1
        ref = {
            t: c
            for t, c in triple_count.items()
            if c >= 2
            and pair_count[(t[0], t[1])] >= 2
            and pair_count[(t[0], t[2])] >= 2
            and pair_count[(t[1], t[2])] >= 2
        }
        # apriori: support(triple)>=2 implies every sub-pair >=2, so the
        # pruned set IS the frequent-triple set
        assert ref == {
            t: c for t, c in triple_count.items() if c >= 2
        }
        got = {
            (r.x, r.y, r.z): r.support
            for r in QUERIES["ext_freq_triples"](spark, sf_dir).collect()
        }
        assert got == ref

    def test_time_weighted_avg_matches_python(self, spark, sf_dir):
        from decimal import Decimal

        rows = (
            read_table(spark, sf_dir, "events")
            .select("event_type", "ts", "event_id", "value")
            .collect()
        )
        per_type = defaultdict(list)
        for r in rows:
            cents = int(Decimal(repr(r.value)).quantize(Decimal("0.01")) * 100)
            per_type[r.event_type].append((r.ts, r.event_id, cents))
        got = {r.event_type: r for r in QUERIES["ext_time_weighted_avg"](spark, sf_dir).collect()}
        for t, seq in per_type.items():
            seq.sort()
            wsum = tsum = 0
            for (ts0, _, v), (ts1, _, _) in zip(seq, seq[1:]):
                d = ts1 - ts0
                dt = (d.days * 86_400 + d.seconds) * 1_000_000 + d.microseconds
                wsum += v * dt
                tsum += dt
            assert got[t].n_intervals == len(seq) - 1
            assert got[t].twa == pytest.approx(wsum / tsum / 100.0, rel=1e-12)

    def test_impute_median_fills_every_gap_with_group_median(self, spark, sf_dir):
        import statistics
        from decimal import Decimal

        rows = (
            read_table(spark, sf_dir, "events")
            .select("event_id", "event_type", "value")
            .collect()
        )
        present = defaultdict(list)
        for r in rows:
            if r.event_id % 10 != 0:
                present[r.event_type].append(
                    int(Decimal(repr(r.value)).quantize(Decimal("0.01")) * 100)
                )
        med = {t: statistics.median(v) for t, v in present.items()}
        got = QUERIES["ext_impute_median"](spark, sf_dir).collect()
        assert len(got) == len(rows)
        by_id = {r.event_id: r for r in rows}
        for r in got:
            if r.was_imputed:
                assert r.event_id % 10 == 0
                assert r.imputed_value == pytest.approx(med[r.event_type] / 100.0)
            else:
                assert r.imputed_value == by_id[r.event_id].value

    def test_trend_ols_matches_numpy(self, spark, sf_dir):
        import numpy as np

        daily = (
            read_table(spark, sf_dir, "events")
            .groupBy("event_type", F.col("ts").cast("date").alias("day"))
            .agg(
                F.round(F.sum(F.col("value").cast("decimal(38,6)")) * 100, 0)
                .cast("long")
                .alias("c")
            )
            .collect()
        )
        import datetime

        by_type = defaultdict(list)
        epoch = datetime.date(2024, 1, 1)
        for r in daily:
            by_type[r.event_type].append(((r.day - epoch).days, r.c))
        got = {r.event_type: r for r in QUERIES["ext_trend_ols"](spark, sf_dir).collect()}
        for t, pts in by_type.items():
            x = np.array([p[0] for p in pts], dtype=float)
            y = np.array([p[1] for p in pts], dtype=float)
            slope, intercept = np.polyfit(x, y, 1)
            r = np.corrcoef(x, y)[0, 1]
            assert got[t].n_days == len(pts)
            assert got[t].slope_per_day == pytest.approx(slope / 100, rel=1e-9)
            assert got[t].intercept == pytest.approx(intercept / 100, rel=1e-9)
            assert got[t].r2 == pytest.approx(r * r, rel=1e-9)

    def test_survival_km_matches_python(self, spark, sf_dir):
        rows = (
            read_table(spark, sf_dir, "events")
            .select("user_id", "ts", "event_type")
            .collect()
        )
        first_seen, first_buy = {}, {}
        mxd = max(r.ts.date() for r in rows)
        for r in rows:
            d = r.ts.date()
            first_seen[r.user_id] = min(first_seen.get(r.user_id, d), d)
            if r.event_type == "purchase":
                first_buy[r.user_id] = min(first_buy.get(r.user_id, d), d)
        durs = []
        for u, fs in first_seen.items():
            if u in first_buy:
                durs.append(((first_buy[u] - fs).days, 1))
            else:
                durs.append(((mxd - fs).days, 0))
        n_risk_total = len(durs)
        by_t = defaultdict(lambda: [0, 0])  # t -> [n_total, n_events]
        for d, e in durs:
            by_t[d][0] += 1
            by_t[d][1] += e
        s, removed = 1.0, 0
        ref = {}
        for t in sorted(by_t):
            n_tot, n_ev = by_t[t]
            n_risk = n_risk_total - removed
            if n_ev > 0:
                s *= (n_risk - n_ev) / n_risk
                ref[t] = (n_risk, n_ev, s)
            removed += n_tot
        got = {r.t_days: r for r in QUERIES["ext_survival_km"](spark, sf_dir).collect()}
        assert set(got) == set(ref)
        for t, (n_risk, n_ev, s_ref) in ref.items():
            assert got[t].n_risk == n_risk
            assert got[t].n_events == n_ev
            # 6-dp rounded ln terms accumulate; tolerance covers the curve
            assert got[t].survival == pytest.approx(s_ref, abs=5e-5)
        # survival is nonincreasing and within [0, 1]
        ts = sorted(got)
        vals = [got[t].survival for t in ts]
        assert all(0.0 <= v <= 1.0 for v in vals)
        assert all(a >= b - 1e-12 for a, b in zip(vals, vals[1:]))

    def test_cramers_v_consistent_with_chi_square(self, spark, sf_dir):
        chi = QUERIES["ext_chi_square"](spark, sf_dir).collect()[0]
        v = QUERIES["ext_cramers_v"](spark, sf_dir).collect()[0]
        assert v.n == chi.n
        ref = (chi.chi2 / (v.n * v.mindim)) ** 0.5
        assert v.cramers_v == pytest.approx(ref, rel=1e-9)
        assert 0.0 <= v.cramers_v <= 1.0

    def test_cuped_matches_numpy(self, spark, sf_dir):
        import datetime
        import hashlib

        import numpy as np
        from decimal import Decimal

        rows = (
            read_table(spark, sf_dir, "events")
            .select("user_id", "ts", "value")
            .collect()
        )
        cutoff = datetime.date(2024, 1, 16)
        acc = defaultdict(lambda: [Decimal(0), Decimal(0)])
        for r in rows:
            d = Decimal(repr(r.value))
            acc[r.user_id][0 if r.ts.date() < cutoff else 1] += d
        users = sorted(acc)
        pre = np.array([float((acc[u][0] * 100).quantize(Decimal(1))) for u in users])
        post = np.array([float((acc[u][1] * 100).quantize(Decimal(1))) for u in users])
        var = np.array(
            [int(hashlib.md5(str(u).encode()).hexdigest()[:8], 16) % 2 for u in users]
        )
        theta_ref = np.cov(pre, post, bias=True)[0, 1] / np.var(pre)
        got = {r.variant: r for r in QUERIES["ext_cuped"](spark, sf_dir).collect()}
        assert got[0].theta == pytest.approx(theta_ref, rel=1e-9)
        for v in (0, 1):
            sel = var == v
            assert got[v].n_v == sel.sum()
            assert got[v].mean_post == pytest.approx(post[sel].mean() / 100, rel=1e-9)
            adj = post[sel].mean() - theta_ref * (pre[sel].mean() - pre.mean())
            assert got[v].mean_adjusted == pytest.approx(adj / 100, rel=1e-9)
        # CUPED must shrink the variant gap toward the true (null) effect
        raw_gap = abs(got[0].mean_post - got[1].mean_post)
        adj_gap = abs(got[0].mean_adjusted - got[1].mean_adjusted)
        assert adj_gap <= raw_gap * 1.5  # no inflation beyond noise

    def test_sprt_llr_matches_python(self, spark, sf_dir):
        got = QUERIES["ext_sprt_monitor"](spark, sf_dir).collect()
        assert len(got) == 30
        for r in got:
            llr_ref = r.cum_hits * math.log(0.21 / 0.19) + (
                r.cum_trials - r.cum_hits
            ) * math.log(0.79 / 0.81)
            assert r.llr == pytest.approx(llr_ref, rel=1e-12)
            assert r.accept_h1 == (r.llr >= math.log(19))
            assert r.accept_h0 == (r.llr <= -math.log(19))

    def test_trimmed_mean_matches_python(self, spark, sf_dir):
        from decimal import Decimal

        rows = (
            read_table(spark, sf_dir, "events")
            .select("event_type", "value")
            .collect()
        )
        per_type = defaultdict(list)
        for r in rows:
            per_type[r.event_type].append(
                int(Decimal(repr(r.value)).quantize(Decimal("0.01")) * 100)
            )
        got = {r.event_type: r for r in QUERIES["ext_trimmed_mean"](spark, sf_dir).collect()}
        for t, vals in per_type.items():
            vals.sort()
            n = len(vals)
            lo = n * 5 // 100
            kept = vals[lo : n - lo]
            assert got[t].n == n
            assert got[t].n_kept == len(kept)
            assert got[t].trimmed_mean == pytest.approx(
                sum(kept) / len(kept) / 100, rel=1e-12
            )

    def test_diff_in_diff_matches_python(self, spark, sf_dir):
        import datetime
        import hashlib
        from decimal import Decimal

        rows = (
            read_table(spark, sf_dir, "events")
            .select("user_id", "ts", "value")
            .collect()
        )
        cutoff = datetime.date(2024, 1, 16)
        cells = defaultdict(lambda: [0, Decimal(0)])
        for r in rows:
            v = int(hashlib.md5(str(r.user_id).encode()).hexdigest()[:8], 16) % 2
            p = 1 if r.ts.date() >= cutoff else 0
            cells[(v, p)][0] += 1
            cells[(v, p)][1] += Decimal(repr(r.value))
        def mean(v, p):
            n, s = cells[(v, p)]
            return float((s * 100).quantize(Decimal(1))) / n / 100
        got = QUERIES["ext_diff_in_diff"](spark, sf_dir).collect()[0]
        assert got.mean_a_pre == pytest.approx(mean(0, 0), rel=1e-12)
        assert got.mean_b_post == pytest.approx(mean(1, 1), rel=1e-12)
        ref_did = (mean(1, 1) - mean(1, 0)) - (mean(0, 1) - mean(0, 0))
        assert got.did == pytest.approx(ref_did, abs=1e-9)

    def test_psi_matches_python(self, spark, sf_dir):
        import datetime
        from decimal import Decimal

        rows = (
            read_table(spark, sf_dir, "events")
            .select("ts", "value")
            .collect()
        )
        cutoff = datetime.date(2024, 1, 16)
        a, c = Counter(), Counter()
        for r in rows:
            if r.value is None:
                continue
            cents = int(Decimal(repr(r.value)).quantize(Decimal("0.01")) * 100)
            b = min(cents // 1000, 9)
            (c if r.ts.date() >= cutoff else a)[b] += 1
        bins = sorted(set(a) | set(c))
        na = sum(a[b] + 1 for b in bins)
        nc = sum(c[b] + 1 for b in bins)
        ref = sum(
            ((a[b] + 1) / na - (c[b] + 1) / nc)
            * math.log(((a[b] + 1) * nc) / ((c[b] + 1) * na))
            for b in bins
        )
        got = QUERIES["ext_psi"](spark, sf_dir).collect()[0]
        assert (got.n_ref, got.n_cur) == (na, nc)
        assert got.psi == pytest.approx(ref, abs=5e-6)
        assert got.psi >= 0

    def test_burstiness_matches_python(self, spark, sf_dir):
        rows = (
            read_table(spark, sf_dir, "events")
            .select("event_type", F.col("ts").cast("date").alias("day"))
            .collect()
        )
        daily = Counter((r.event_type, r.day) for r in rows)
        per_type = defaultdict(list)
        for (t, _), c in daily.items():
            per_type[t].append(c)
        got = {r.event_type: r for r in QUERIES["ext_burstiness"](spark, sf_dir).collect()}
        for t, cs in per_type.items():
            n = len(cs)
            mean = sum(cs) / n
            var = sum((c - mean) ** 2 for c in cs) / n
            assert got[t].n_days == n
            assert got[t].n_events == sum(cs)
            assert got[t].fano == pytest.approx(var / mean, rel=1e-9)

    def test_token_overlap_matches_python(self, spark, sf_dir):
        import re as _re

        docs = read_table(spark, sf_dir, "documents").select("lang", "text").collect()
        vocab = defaultdict(set)
        for r in docs:
            toks = _re.sub(r"\s+", " ", r.text.lower()).strip().split(" ")
            vocab[r.lang].update(t for t in toks if t)
        got = {
            (r.lang_a, r.lang_b): r
            for r in QUERIES["ext_token_overlap_matrix"](spark, sf_dir).collect()
        }
        langs = sorted(vocab)
        expected_pairs = {
            (a, b)
            for i, a in enumerate(langs)
            for b in langs[i + 1 :]
            if vocab[a] & vocab[b]
        }
        assert set(got) == expected_pairs
        for (a, b), r in got.items():
            inter = len(vocab[a] & vocab[b])
            union = len(vocab[a] | vocab[b])
            assert (r.v_a, r.v_b, r.v_shared) == (len(vocab[a]), len(vocab[b]), inter)
            assert r.vocab_jaccard == pytest.approx(inter / union, rel=1e-12)

    def test_zipf_fit_matches_numpy(self, spark, sf_dir):
        import re as _re

        import numpy as np

        docs = read_table(spark, sf_dir, "documents").select("text").collect()
        freq = Counter()
        for r in docs:
            toks = _re.sub(r"\s+", " ", r.text.lower()).strip().split(" ")
            freq.update(t for t in toks if t)
        top = sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))[:1000]
        x = np.log(np.arange(1, len(top) + 1))
        y = np.log([f for _, f in top])
        slope = np.polyfit(x, y, 1)[0]
        r = np.corrcoef(x, y)[0, 1]
        got = QUERIES["ext_zipf_fit"](spark, sf_dir).collect()[0]
        assert got.n_tokens == len(top)
        # 6-dp quantized logs vs full precision: loose but binding
        assert got.zipf_slope == pytest.approx(slope, abs=1e-4)
        assert got.r2 == pytest.approx(r * r, abs=1e-4)
        assert got.zipf_slope < 0  # frequencies decay with rank


class TestRound4Session2Semantics:
    """Semantic self-checks for the session-2 operators — properties
    the DuckDB oracle can't express (it would just re-run the same
    SQL): invariants that must hold by the MEANING of each operator."""

    def _run(self, spark, sf_dir, name):
        from proto_to_avro_ql_spark.entry_queries import QUERIES

        return QUERIES[name](spark, sf_dir)

    def test_shortest_path_distances_match_brute_force_bfs(self, spark, sf_dir):
        """Driver-side BFS over the collected edge list must agree with
        the distributed 3-round relaxation exactly."""
        from collections import deque

        from proto_to_avro_ql_spark.operators.graphs import copurchase_edges

        edges = copurchase_edges(spark, sf_dir, min_support=2).collect()
        adj: dict[int, set[int]] = {}
        for r in edges:
            adj.setdefault(r["u"], set()).add(r["v"])
            adj.setdefault(r["v"], set()).add(r["u"])
        seeds = sorted(n for n in adj if n % 50 == 0)
        dist = {s: 0 for s in seeds}
        q = deque(seeds)
        while q:
            n = q.popleft()
            if dist[n] >= 3:
                continue
            for nb in adj[n]:
                if nb not in dist:
                    dist[nb] = dist[n] + 1
                    q.append(nb)
        got = {
            r["id"]: r["dist"]
            for r in self._run(spark, sf_dir, "ext_shortest_path").collect()
        }
        assert got == dist

    def test_modularity_is_bounded_and_consistent(self, spark, sf_dir):
        """Q ∈ [-0.5, 1] by definition; intra-community edges cannot
        exceed total edges; community count cannot exceed node count."""
        row = self._run(spark, sf_dir, "ext_modularity").collect()[0]
        assert -0.5 <= row["modularity"] <= 1.0
        assert 0 <= row["e_in"] <= row["m"]
        assert row["n_communities"] >= 1

    def test_negative_samples_never_hit_positives(self, spark, sf_dir):
        """The defining property: no sampled negative may be a real
        (customer, part) purchase, and every customer gets at most 3."""
        from proto_to_avro_ql_spark.sources.io import read_table

        neg = self._run(spark, sf_dir, "ext_negative_sampling")
        o = read_table(spark, sf_dir, "orders").selectExpr(
            "o_orderkey AS ok", "o_custkey AS u"
        )
        l = read_table(spark, sf_dir, "lineitem").selectExpr(
            "l_orderkey AS ok", "l_partkey AS p"
        )
        pos = o.join(l, "ok").select("u", "p").distinct()
        hits = neg.join(
            pos,
            (neg["o_custkey"] == pos["u"]) & (neg["neg_pk"] == pos["p"]),
            "inner",
        ).count()
        assert hits == 0
        per_user = neg.groupBy("o_custkey").count().agg({"count": "max"}).collect()[0][0]
        assert per_user <= 3

    def test_scd2_intervals_chain_with_one_current_row_per_key(self, spark, sf_dir):
        """Interval chaining: per customer the rows ordered by
        valid_from must tile (each valid_to equals the next
        valid_from), exactly one row is open (9999-12-31), and that
        row is the is_current one."""
        rows = self._run(spark, sf_dir, "ext_scd2_build").collect()
        by_cust: dict[int, list] = {}
        for r in rows:
            by_cust.setdefault(r["o_custkey"], []).append(r)
        for cust, rs in by_cust.items():
            rs.sort(key=lambda r: (r["valid_from"], r["valid_to"]))
            open_rows = [r for r in rs if r["valid_to"] == "9999-12-31"]
            assert len(open_rows) == 1, cust
            assert all(
                (r["valid_to"] == "9999-12-31") == (r["is_current"] == 1) for r in rs
            ), cust

    def test_prop_ztest_rates_consistent_with_counts(self, spark, sf_dir):
        row = self._run(spark, sf_dir, "ext_prop_ztest").collect()[0]
        assert row["rate_a"] == row["x_a"] / row["n_a"]
        assert row["rate_b"] == row["x_b"] / row["n_b"]

    def test_group_split_sources_never_straddle_splits(self, spark, sf_dir):
        """The leakage guard itself: summing n_sources across splits
        must equal the corpus' distinct-source count (a source in two
        splits would double-count)."""
        from proto_to_avro_ql_spark.sources.io import read_table

        out = self._run(spark, sf_dir, "ext_group_split").collect()
        total_sources = (
            read_table(spark, sf_dir, "documents").select("source").distinct().count()
        )
        assert sum(r["n_sources"] for r in out) == total_sources

    def test_rfm_scores_cover_the_grid_and_users(self, spark, sf_dir):
        from proto_to_avro_ql_spark.sources.io import read_table

        out = self._run(spark, sf_dir, "ext_rfm").collect()
        n_users = (
            read_table(spark, sf_dir, "events").select("user_id").distinct().count()
        )
        assert sum(r["n_users"] for r in out) == n_users
        for r in out:
            assert 1 <= r["r_score"] <= 5
            assert 1 <= r["f_score"] <= 5
            assert 1 <= r["m_score"] <= 5

    def test_fk_audit_healthy_zeros_and_planted_orphan_detected(
        self, spark, sf_dir
    ):
        """The shipped relationships are all healthy (zeros); the
        NONZERO path is proven by planting an orphan child row and
        running the same broadcast anti-join shape."""
        from pyspark.sql import functions as F

        from proto_to_avro_ql_spark.sources.io import read_table

        rows = {
            r["relationship"]: r["n_orphan"]
            for r in self._run(spark, sf_dir, "ext_fk_audit").collect()
        }
        assert set(rows.values()) == {0}, rows
        orders = read_table(spark, sf_dir, "orders")
        li = read_table(spark, sf_dir, "lineitem").select("l_orderkey")
        planted = li.unionByName(
            spark.createDataFrame([(-1,)], "l_orderkey long")
        )
        n = planted.join(
            F.broadcast(orders.select("o_orderkey")),
            planted["l_orderkey"] == F.col("o_orderkey"),
            "left_anti",
        ).count()
        assert n == 1

    def test_cohens_kappa_bounded_and_counts_partition(self, spark, sf_dir):
        row = self._run(spark, sf_dir, "ext_cohens_kappa").collect()[0]
        assert -1.0 <= row["kappa"] <= 1.0
        assert row["n11"] + row["n10"] + row["n01"] + row["n00"] == row["n"]

    def test_clustering_coeff_consistent_with_triangle_relation(
        self, spark, sf_dir
    ):
        row = self._run(spark, sf_dir, "ext_clustering_coeff").collect()[0]
        assert 0.0 <= row["global_cc"] <= 1.0
        assert row["wedges"] >= 3 * row["triangles"]

    def test_backtest_mae_dominates_abs_bias(self, spark, sf_dir):
        """|bias| <= MAE by the triangle inequality — a cheap check the
        two aggregates weren't crossed."""
        for r in self._run(spark, sf_dir, "ext_backtest_naive").collect():
            assert abs(r["bias"]) <= r["mae"] + 1e-12

    def test_wilson_interval_contains_p_hat_inside_unit_range(self, spark, sf_dir):
        for r in self._run(spark, sf_dir, "ext_wilson_interval").collect():
            assert 0.0 <= r["ci_lo"] <= r["p_hat"] <= r["ci_hi"] <= 1.0

    def test_srm_check_passes_on_the_healthy_md5_split(self, spark, sf_dir):
        row = self._run(spark, sf_dir, "ext_srm_check").collect()[0]
        assert row["srm_flag"] == 0
        assert row["chi_square"] >= 0.0

    def test_pareto_frontier_is_exactly_the_undominated_set(self, spark, sf_dir):
        """Brute-force dominance check: a part is on the frontier iff
        no other part is strictly cheaper-or-equal AND bigger with at
        least one strict."""
        from proto_to_avro_ql_spark.sources.io import read_table

        parts = read_table(spark, sf_dir, "part").select(
            "p_partkey", "p_retailprice", "p_size"
        ).collect()
        def dominated(a):
            return any(
                (b["p_retailprice"] <= a["p_retailprice"] and b["p_size"] >= a["p_size"])
                and (b["p_retailprice"] < a["p_retailprice"] or b["p_size"] > a["p_size"])
                for b in parts
            )
        expected = {p["p_partkey"] for p in parts if not dominated(p)}
        got = {
            r["p_partkey"]
            for r in self._run(spark, sf_dir, "ext_pareto_frontier").collect()
        }
        # the windowed skyline breaks price ties by part key, so of two
        # same-price same-size parts only the lower key survives —
        # brute force keeps both (neither strictly dominates); the
        # windowed set is therefore a subset resolving ties minimally
        assert got <= expected
        missing = expected - got
        by_key = {p["p_partkey"]: p for p in parts}
        for k in missing:
            a = by_key[k]
            assert any(
                b["p_retailprice"] == a["p_retailprice"]
                and b["p_size"] >= a["p_size"]
                and b["p_partkey"] < k
                for b in parts
            ), f"{k} missing without a tie justification"

    def test_contribution_shares_sum_to_one(self, spark, sf_dir):
        rows = self._run(spark, sf_dir, "ext_contribution_analysis").collect()
        assert abs(sum(r["contribution"] for r in rows) - 1.0) < 1e-9
        total = sum(r["delta_cents"] for r in rows)
        assert all(r["cents_p1"] - r["cents_p0"] == r["delta_cents"] for r in rows)
        assert total != 0


class TestBatch9Semantics:
    """Semantic self-checks for the batch-9 operators (beyond the
    DuckDB value-hash oracles): invariants brute-forced or bounded
    independently of both engines."""

    def _run(self, spark, sf_dir, name):
        from proto_to_avro_ql_spark.entry_queries import QUERIES

        return QUERIES[name](spark, sf_dir)

    def test_spearman_bounds_and_sign(self, spark, sf_dir):
        rows = self._run(spark, sf_dir, "ext_spearman").collect()
        assert rows, "no groups"
        for r in rows:
            assert -1.0 <= r["rho"] <= 1.0
        # quantity and price bucket are independent in the synthetic
        # data — rho should be near zero, not near ±1
        assert all(abs(r["rho"]) < 0.5 for r in rows)

    def test_spearman_matches_scipy_free_reference(self, spark, sf_dir):
        # brute-force tie-averaged rank correlation on the raw rows
        import duckdb

        rows = duckdb.sql(
            f"""SELECT l_returnflag,
                       CAST(CAST(l_quantity AS DECIMAL(38,2)) AS BIGINT) AS x,
                       CAST(CAST(l_extendedprice AS DECIMAL(38,2)) * 100
                            AS BIGINT) // 100000 AS yb
                FROM '{sf_dir}/lineitem.parquet'"""
        ).fetchall()
        import collections

        byg = collections.defaultdict(list)
        for g, x, yb in rows:
            byg[g].append((x, yb))

        def avg_ranks(vals):
            order = sorted(range(len(vals)), key=lambda i: vals[i])
            ranks = [0.0] * len(vals)
            i = 0
            while i < len(order):
                j = i
                while j < len(order) and vals[order[j]] == vals[order[i]]:
                    j += 1
                r = (i + 1 + j) / 2.0
                for k in range(i, j):
                    ranks[order[k]] = r
                i = j
            return ranks

        got = {
            r["l_returnflag"]: r["rho"]
            for r in self._run(spark, sf_dir, "ext_spearman").collect()
        }
        for g, pts in byg.items():
            rx = avg_ranks([p[0] for p in pts])
            ry = avg_ranks([p[1] for p in pts])
            n = len(pts)
            mx, my = sum(rx) / n, sum(ry) / n
            num = sum((a - mx) * (b - my) for a, b in zip(rx, ry))
            den = (
                sum((a - mx) ** 2 for a in rx) * sum((b - my) ** 2 for b in ry)
            ) ** 0.5
            assert abs(got[g] - num / den) < 1e-9

    def test_t_closeness_bounds(self, spark, sf_dir):
        rows = self._run(spark, sf_dir, "ext_t_closeness").collect()
        assert rows
        for r in rows:
            assert 0.0 <= r["t_dist"] <= 1.0
            assert r["breach"] == (r["t_dist"] > 0.2)
        # weighted average distance can't be 0 unless all groups equal
        # the global distribution — with 99 small groups some differ
        assert any(r["t_dist"] > 0.0 for r in rows)

    def test_readability_counts(self, spark, sf_dir):
        rows = self._run(spark, sf_dir, "ext_readability").collect()
        assert rows
        for r in rows:
            assert r["syllables"] >= r["words"] > 0  # floored at 1/word
            assert r["sentences"] >= r["n_docs"]  # floored at 1/doc
            assert 0 <= r["n_difficult"] <= r["n_docs"]
            assert r["flesch"] < 206.835

    def test_assoc_rules_invariants(self, spark, sf_dir):
        rows = self._run(spark, sf_dir, "ext_assoc_rules").collect()
        assert rows
        for r in rows:
            assert r["n_pair"] >= 2
            assert 0.0 < r["support"] <= 1.0
            assert 0.0 < r["confidence"] <= 1.0
            assert r["n_pair"] <= min(r["n_ante"], r["n_cons"])
            # lift * n_ante * n_cons == n_pair * N (exact in doubles here)
            assert r["lift"] > 0.0
        # both directions of a pair carry the same n_pair and lift
        by_pair = {}
        for r in rows:
            key = tuple(sorted((r["antecedent"], r["consequent"])))
            by_pair.setdefault(key, []).append(r)
        for key, rs in by_pair.items():
            if len(rs) == 2:
                assert rs[0]["n_pair"] == rs[1]["n_pair"]
                assert abs(rs[0]["lift"] - rs[1]["lift"]) < 1e-12

    def test_ohlc_bar_invariants(self, spark, sf_dir):
        rows = self._run(spark, sf_dir, "ext_ohlc").collect()
        assert rows
        for r in rows:
            assert r["low_cents"] <= r["open_cents"] <= r["high_cents"]
            assert r["low_cents"] <= r["close_cents"] <= r["high_cents"]
            assert r["n_events"] >= 1

    def test_holt_recurrence_brute_force(self, spark, sf_dir):
        rows = self._run(spark, sf_dir, "ext_holt").collect()
        assert rows
        import collections

        byt = collections.defaultdict(list)
        for r in rows:
            byt[r["event_type"]].append(r)
        for t, rs in byt.items():
            rs.sort(key=lambda r: r["day"])
            # dense grid: consecutive days
            l = b = 0
            for i, r in enumerate(rs):
                v = int(r["n_events"]) * 1_000_000
                if i == 0:
                    l, b = v, 0
                else:
                    s = v + l + b
                    l_new = s // 2 if s >= 0 else -((-s) // 2)
                    s2 = l_new - l + b
                    b = s2 // 2 if s2 >= 0 else -((-s2) // 2)
                    l = l_new
                assert r["level"] == l / 1e6
                assert r["trend"] == b / 1e6
            # level tracks the series scale: within [min, max] of counts
            # once warmed (level is a convex-ish smoother of history)
            counts = [r["n_events"] for r in rs]
            assert min(counts) - 1 <= rs[-1]["level"] <= max(counts) + 1


class TestBatch10Semantics:
    """Semantic self-checks for batch 10 (rank-pair statistics, causal
    matching, monitoring) — brute-force references independent of both
    engines."""

    def _run(self, spark, sf_dir, name):
        from proto_to_avro_ql_spark.entry_queries import QUERIES

        return QUERIES[name](spark, sf_dir)

    def test_kendall_tau_brute_force(self, spark, sf_dir):
        import duckdb

        rows = duckdb.sql(
            f"""SELECT l_returnflag,
                       CAST(CAST(l_quantity AS DECIMAL(38,2)) AS BIGINT) AS x,
                       CAST(CAST(l_extendedprice AS DECIMAL(38,2)) * 100
                            AS BIGINT) // 100000 AS yb
                FROM '{sf_dir}/lineitem.parquet'"""
        ).fetchall()
        import collections

        byg = collections.defaultdict(list)
        for g, x, yb in rows:
            byg[g].append((x, yb))
        got = {
            r["l_returnflag"]: r
            for r in self._run(spark, sf_dir, "ext_kendall_tau").collect()
        }
        for g, pts in byg.items():
            C = D = 0
            for i in range(len(pts)):
                for j in range(i + 1, len(pts)):
                    dx = pts[i][0] - pts[j][0]
                    dy = pts[i][1] - pts[j][1]
                    if dx * dy > 0:
                        C += 1
                    elif dx * dy < 0:
                        D += 1
            r = got[g]
            assert (r["concordant"], r["discordant"]) == (C, D), g
            n = len(pts)
            n0 = n * (n - 1) // 2
            xt = collections.Counter(p[0] for p in pts)
            yt = collections.Counter(p[1] for p in pts)
            n1 = sum(t * (t - 1) // 2 for t in xt.values())
            n2 = sum(t * (t - 1) // 2 for t in yt.values())
            ref = (C - D) / ((n0 - n1) * (n0 - n2)) ** 0.5
            assert abs(r["tau_b"] - ref) < 1e-9
            assert -1.0 <= r["tau_b"] <= 1.0

    def test_mann_kendall_brute_force(self, spark, sf_dir):
        import duckdb

        daily = duckdb.sql(
            f"""SELECT event_type, date_trunc('day', ts) AS d, COUNT(*) AS n
                FROM '{sf_dir}/events.parquet' GROUP BY 1, 2 ORDER BY 1, 2"""
        ).fetchall()
        import collections

        byt = collections.defaultdict(list)
        for t, d, n in daily:
            byt[t].append(n)
        got = {
            r["event_type"]: r
            for r in self._run(spark, sf_dir, "ext_mann_kendall").collect()
        }
        for t, ns in byt.items():
            S = sum(
                (ns[j] > ns[i]) - (ns[j] < ns[i])
                for i in range(len(ns))
                for j in range(i + 1, len(ns))
            )
            r = got[t]
            assert r["s_stat"] == S
            n = len(ns)
            ties = collections.Counter(ns)
            var = (
                n * (n - 1) * (2 * n + 5)
                - sum(c * (c - 1) * (2 * c + 5) for c in ties.values())
            ) / 18.0
            assert abs(r["var_s"] - var) < 1e-9
            if S > 0:
                assert abs(r["z"] - (S - 1) / var**0.5) < 1e-9
            elif S < 0:
                assert abs(r["z"] - (S + 1) / var**0.5) < 1e-9
            else:
                assert r["z"] == 0.0

    def test_psm_match_nearest_in_band(self, spark, sf_dir):
        import duckdb

        raw = duckdb.sql(
            f"""SELECT o_orderkey,
                       CAST(o_custkey % 2 AS BIGINT),
                       CAST(CAST(o_totalprice AS DECIMAL(38,2)) * 100 AS BIGINT),
                       CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END
                FROM '{sf_dir}/orders.parquet'"""
        ).fetchall()
        import collections

        bands = collections.defaultdict(lambda: ([], []))
        for okey, tr, cents, y in raw:
            bands[cents // 1000000][tr].append((cents, okey, y))
        expect = collections.defaultdict(
            lambda: {"n_treated": 0, "n_matched": 0, "sum_yt": 0, "sum_yc": 0}
        )
        for band, (ctrl, treat) in bands.items():
            for cents, okey, y in treat:
                e = expect[band]
                e["n_treated"] += 1
                if not ctrl:
                    continue
                # nearest control cents; tie -> lower side (prev)
                best = min(
                    ctrl,
                    key=lambda c: (
                        abs(c[0] - cents),
                        0 if c[0] <= cents else 1,
                    ),
                )[0]
                # representative control at that cents = min okey
                reps = [c for c in ctrl if c[0] == best]
                yc = min(reps, key=lambda c: c[1])[2]
                e["n_matched"] += 1
                e["sum_yt"] += y
                e["sum_yc"] += yc
        got = {
            r["band"]: r for r in self._run(spark, sf_dir, "ext_psm_match").collect()
        }
        for band, e in expect.items():
            if e["n_matched"] == 0:
                assert band not in got
                continue
            r = got[band]
            for k in ("n_treated", "n_matched", "sum_yt", "sum_yc"):
                assert r[k] == e[k], (band, k, r[k], e[k])

    def test_uplift_deciles_shape(self, spark, sf_dir):
        rows = self._run(spark, sf_dir, "ext_uplift_deciles").collect()
        assert len(rows) == 10
        for r in rows:
            assert -1.0 <= r["uplift"] <= 1.0
            assert 0 <= r["pos_t"] <= r["n_t"]
            assert 0 <= r["pos_c"] <= r["n_c"]
        # the arms partition each decile; decile sizes are NTILE-equal
        sizes = sorted(r["n_t"] + r["n_c"] for r in rows)
        assert sizes[-1] - sizes[0] <= 1

    def test_anomaly_band_brute_force(self, spark, sf_dir):
        rows = self._run(spark, sf_dir, "ext_anomaly_band").collect()
        assert rows
        import duckdb
        import collections

        daily = duckdb.sql(
            f"""SELECT event_type, strftime(date_trunc('day', ts), '%Y-%m-%d'),
                       COUNT(*) FROM '{sf_dir}/events.parquet'
                GROUP BY 1, date_trunc('day', ts) ORDER BY 1, 2"""
        ).fetchall()
        byt = collections.defaultdict(list)
        for t, d, n in daily:
            byt[t].append((d, n))
        got = {(r["event_type"], r["day"]): r for r in rows}
        n_checked = 0
        for t, series in byt.items():
            for i in range(7, len(series)):
                hist = sorted(n for _, n in series[i - 7 : i])
                med = hist[3]
                mad = sorted(abs(v - med) for v in hist)[3]
                d, n = series[i]
                r = got[(t, d)]
                assert (r["med7"], r["mad7"]) == (med, mad)
                assert r["is_anomaly"] == (abs(n - med) > 3 * max(mad, 1))
                n_checked += 1
        assert n_checked == len(rows)


class TestBatch11Semantics:
    """Semantic self-checks for batch 11 (grid DBSCAN, seasonal
    decomposition, JL projection, chi residuals)."""

    def _run(self, spark, sf_dir, name):
        from proto_to_avro_ql_spark.entry_queries import QUERIES

        return QUERIES[name](spark, sf_dir)

    def test_dbscan_grid_partition_and_components(self, spark, sf_dir):
        import duckdb

        rows = self._run(spark, sf_dir, "ext_dbscan_grid").collect()
        total = sum(r["n_points"] for r in rows)
        n = duckdb.sql(
            f"SELECT COUNT(*) FROM '{sf_dir}/embeddings.parquet'"
        ).fetchone()[0]
        assert total == n  # every point labeled exactly once
        clusters = [r for r in rows if r["cluster_id"] != -1]
        assert clusters, "no dense clusters found"
        # brute-force the components on the cell graph
        pts = duckdb.sql(
            f"""SELECT CAST(floor(CAST(embedding[1] AS DOUBLE)*10) AS BIGINT),
                       CAST(floor(CAST(embedding[2] AS DOUBLE)*10) AS BIGINT)
                FROM '{sf_dir}/embeddings.parquet'"""
        ).fetchall()
        import collections

        cnt = collections.Counter(pts)
        dense = {c for c, k in cnt.items() if k >= 5}
        # union-find over 8-neighborhood
        parent = {c: c for c in dense}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for cx, cy in dense:
            for dx in (-1, 0, 1):
                for dy in (-1, 0, 1):
                    nb = (cx + dx, cy + dy)
                    if nb in dense:
                        ra, rb = find((cx, cy)), find(nb)
                        if ra != rb:
                            parent[ra] = rb
        comps = collections.defaultdict(lambda: [0, 0])
        for c in dense:
            root = find(c)
            comps[root][0] += 1
            comps[root][1] += cnt[c]
        expect = sorted((v[0], v[1]) for v in comps.values())
        got = sorted((r["n_cells"], r["n_points"]) for r in clusters)
        assert got == expect
        noise = [r for r in rows if r["cluster_id"] == -1]
        exp_noise = sum(k for c, k in cnt.items() if c not in dense)
        if exp_noise:
            assert noise[0]["n_points"] == exp_noise

    def test_seasonal_decompose_identity(self, spark, sf_dir):
        rows = self._run(spark, sf_dir, "ext_seasonal_decompose").collect()
        assert rows
        for r in rows:
            # additive identity holds exactly (same doubles both terms)
            assert abs(
                r["n_events"] - r["trend"] - r["seasonal"] - r["residual"]
            ) < 1e-9
        # trend is a 7-day average: between min and max of the series
        import collections

        byt = collections.defaultdict(list)
        for r in rows:
            byt[r["event_type"]].append(r)
        for t, rs in byt.items():
            ns = [r["n_events"] for r in rs]
            assert all(min(ns) - 30 <= r["trend"] <= max(ns) + 30 for r in rs)

    def test_jl_projection_preserves_dot_products_roughly(self, spark, sf_dir):
        import collections

        rows = self._run(spark, sf_dir, "ext_jl_projection").collect()
        byv = collections.defaultdict(dict)
        for r in rows:
            byv[r["vec_id"]][r["j"]] = r["proj"]
        assert all(len(v) == 8 for v in byv.values())
        # norms concentrate: E[||proj||^2] = k * ||x||^2 — check the
        # RATIO distribution is centered near k (=8) within loose bounds
        import duckdb

        norms = dict(
            duckdb.sql(
                f"""SELECT vec_id, list_sum(list_transform(embedding,
                         x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)))
                    FROM '{sf_dir}/embeddings.parquet' GROUP BY 1, 2"""
            ).fetchall()
        )
        ratios = []
        for v, ps in byv.items():
            pn = sum(x * x for x in ps.values())
            if norms[v] > 1e-9:
                ratios.append(pn / norms[v])
        mean_ratio = sum(ratios) / len(ratios)
        assert 4.0 < mean_ratio < 12.0  # k=8, loose JL concentration

    def test_chi_residuals_consistency(self, spark, sf_dir):
        rows = self._run(spark, sf_dir, "ext_chi_residuals").collect()
        assert rows
        # expected counts sum to N per row-marginal; residual sign
        # matches obs vs expected
        tot_obs = sum(r["obs"] for r in rows)
        tot_exp = sum(r["expected"] for r in rows)
        assert abs(tot_obs - tot_exp) < 1e-6
        for r in rows:
            assert r["notable"] == (abs(r["std_residual"]) > 2.0)
            if r["obs"] > r["expected"]:
                assert r["std_residual"] > 0
            elif r["obs"] < r["expected"]:
                assert r["std_residual"] < 0


class TestBatch12Semantics:
    """Semantic self-checks for batch 12 (isotonic PAV, Shapley
    attribution, power-iteration PCA)."""

    def _run(self, spark, sf_dir, name):
        from proto_to_avro_ql_spark.entry_queries import QUERIES

        return QUERIES[name](spark, sf_dir)

    def test_isotonic_matches_sequential_pav(self, spark, sf_dir):
        rows = sorted(
            self._run(spark, sf_dir, "ext_isotonic").collect(),
            key=lambda r: r["bucket"],
        )
        assert rows
        # classic sequential pool-adjacent-violators on the buckets
        blocks = [[r["pos"], r["n"]] for r in rows]
        stack = []
        for p, n in blocks:
            stack.append([p, n])
            while (
                len(stack) > 1
                and stack[-2][0] * stack[-1][1] >= stack[-1][0] * stack[-2][1]
            ):
                p2, n2 = stack.pop()
                stack[-1][0] += p2
                stack[-1][1] += n2
        fitted = []
        for p, n in stack:
            fitted.extend([p / n] * 0)  # lengths tracked below
        # expand: replay to know block widths
        widths = []
        stack2 = []
        for p, n in blocks:
            stack2.append([p, n, 1])
            while (
                len(stack2) > 1
                and stack2[-2][0] * stack2[-1][1] >= stack2[-1][0] * stack2[-2][1]
            ):
                p2, n2, w2 = stack2.pop()
                stack2[-1][0] += p2
                stack2[-1][1] += n2
                stack2[-1][2] += w2
        expect = []
        for p, n, w in stack2:
            expect.extend([p / n] * w)
        got = [r["rate_iso"] for r in rows]
        assert len(got) == len(expect)
        for g, e in zip(got, expect):
            assert abs(g - e) < 1e-9
        # monotone non-decreasing
        for a, b in zip(got, got[1:]):
            assert b >= a - 1e-12

    def test_shapley_efficiency_axiom(self, spark, sf_dir):
        import duckdb

        rows = self._run(spark, sf_dir, "ext_shapley_attribution").collect()
        assert len(rows) == 4
        # efficiency: sum of credits = v(grand coalition) - v(empty set)
        # in the truncated-micros value function
        obs = dict(
            (bm, (u, c))
            for bm, u, c in duckdb.sql(
                f"""SELECT bm, COUNT(*), SUM(conv) FROM (
                     SELECT user_id,
                            SUM(DISTINCT CASE event_type
                              WHEN 'click' THEN 1 WHEN 'error' THEN 2
                              WHEN 'signup' THEN 4 WHEN 'view' THEN 8
                              ELSE 0 END) AS bm,
                            MAX(CASE WHEN event_type = 'purchase'
                                THEN 1 ELSE 0 END) AS conv
                     FROM '{sf_dir}/events.parquet' GROUP BY user_id)
                   GROUP BY bm"""
            ).fetchall()
        )

        def v(bm):
            if bm not in obs or obs[bm][0] == 0:
                return 0
            u, c = obs[bm]
            return (c * 1_000_000) // u / 1e6

        total = sum(r["shapley"] for r in rows)
        assert abs(total - (v(15) - v(0))) < 1e-6

    def test_pca_power_matches_numpy(self, spark, sf_dir):
        import numpy as np
        import duckdb

        rows = sorted(
            self._run(spark, sf_dir, "ext_pca_power").collect(),
            key=lambda r: r["dim"],
        )
        assert len(rows) == 16
        v = np.array([r["loading"] for r in rows])
        # reference: numpy top eigenvector of the float covariance
        embs = duckdb.sql(
            f"SELECT embedding FROM '{sf_dir}/embeddings.parquet'"
        ).fetchall()
        X = np.array([e[0][:16] for e in embs], dtype=np.float64)
        C = np.cov(X, rowvar=False, bias=True)
        vals = np.linalg.eigvalsh(C)
        # the synthetic cloud is near-isotropic (top eigvals within
        # ~15% of each other) so the DIRECTION is ill-conditioned after
        # 3 iterations; the meaningful convergence metric is the
        # Rayleigh quotient — the captured variance along the returned
        # direction vs the max eigenvalue (measured ~0.92 here)
        ray = float(v @ C @ v) / float(v @ v)
        assert ray > 0.85 * vals[-1], (ray, vals[-1])


class TestBatch13Semantics:
    """Semantic self-checks for batch 13 (split search, randomization
    inference, raking)."""

    def _run(self, spark, sf_dir, name):
        from proto_to_avro_ql_spark.entry_queries import QUERIES

        return QUERIES[name](spark, sf_dir)

    def test_best_split_brute_force(self, spark, sf_dir):
        import duckdb

        raw = duckdb.sql(
            f"""SELECT CAST(CAST(value AS DECIMAL(38,2)) * 100 AS BIGINT)
                         // 2500,
                       CAST(user_id % 2 AS BIGINT)
                FROM '{sf_dir}/events.parquet' WHERE value IS NOT NULL"""
        ).fetchall()
        import collections

        agg = collections.defaultdict(lambda: [0, 0])
        for b, lb in raw:
            agg[b][0] += 1
            agg[b][1] += lb
        bs = sorted(agg)
        rows = {r["split"]: r for r in self._run(spark, sf_dir, "ext_best_split").collect()}
        best, best_imp = None, None
        for t in bs[:-1]:
            n_l = sum(agg[b][0] for b in bs if b <= t)
            p_l = sum(agg[b][1] for b in bs if b <= t)
            n_r = sum(agg[b][0] for b in bs if b > t)
            p_r = sum(agg[b][1] for b in bs if b > t)
            imp = (2_000_000 * p_l * (n_l - p_l)) // n_l + (
                2_000_000 * p_r * (n_r - p_r)
            ) // n_r
            r = rows[t]
            assert (r["n_l"], r["pos_l"], r["n_r"], r["pos_r"]) == (
                n_l, p_l, n_r, p_r,
            )
            assert abs(r["impurity"] - imp / 1e6) < 1e-9
            if best_imp is None or (imp, t) < (best_imp, best):
                best, best_imp = t, imp
        assert [t for t, r in rows.items() if r["is_best"]] == [best]

    def test_permutation_test_sanity(self, spark, sf_dir):
        r = self._run(spark, sf_dir, "ext_permutation_test").collect()[0]
        assert r["n_perm"] == 100
        assert 0 <= r["n_exceed"] <= 100
        assert 0.0 < r["p_value"] <= 1.0
        # user parity vs value is synthetic-independent: the observed
        # diff should NOT be extreme among the replicates
        assert r["p_value"] > 0.01

    def test_raking_hits_both_margins(self, spark, sf_dir):
        rows = self._run(spark, sf_dir, "ext_raking").collect()
        assert rows
        import collections

        n_tot = sum(r["n"] for r in rows)
        langs = collections.defaultdict(float)
        sources = collections.defaultdict(float)
        for r in rows:
            langs[r["lang"]] += r["n"] * r["weight"]
            sources[r["source"]] += r["n"] * r["weight"]
        # after the final source step, source margins are exact (up to
        # micros truncation); lang margins are within a few % (IPF
        # converges geometrically)
        tgt_s = n_tot / len(sources)
        for v in sources.values():
            assert abs(v - tgt_s) / tgt_s < 1e-3
        tgt_l = n_tot / len(langs)
        for v in langs.values():
            assert abs(v - tgt_l) / tgt_l < 0.10
        assert all(r["weight"] > 0 for r in rows)


class TestBatch14Semantics:
    """Semantic self-checks for batch 14 (kNN eval, cluster quality,
    COEC position-bias)."""

    def _run(self, spark, sf_dir, name):
        from proto_to_avro_ql_spark.entry_queries import QUERIES

        return QUERIES[name](spark, sf_dir)

    def test_knn_classify_contract(self, spark, sf_dir):
        rows = self._run(spark, sf_dir, "ext_knn_classify").collect()
        assert len(rows) == 20  # one prediction per query
        for r in rows:
            assert 1 <= r["n_votes"] <= 5
            assert r["correct"] == (r["pred_label"] == r["true_label"])
        # the synthetic labels are INDEPENDENT of embedding geometry
        # (1-NN label agreement ~= chance), so accuracy says nothing —
        # instead brute-force the exact same pipeline (rounded cosine,
        # id tie-break, (votes DESC, label ASC) vote) and demand
        # identical predictions
        import duckdb
        import numpy as np

        raw = duckdb.sql(
            f"SELECT vec_id, label, embedding"
            f" FROM '{sf_dir}/embeddings.parquet' ORDER BY vec_id"
        ).fetchall()
        ids = np.array([r[0] for r in raw])
        y = {r[0]: r[1] for r in raw}
        X = np.array([r[2] for r in raw], dtype=np.float64)
        Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
        got = {r["query_id"]: r for r in rows}
        for qi, qid in enumerate(ids[:20]):
            sims = np.round(Xn[qi] @ Xn.T, 6)
            cand = [
                (-sims[k], ids[k]) for k in range(len(ids)) if ids[k] != qid
            ]
            cand.sort()
            top5 = [c[1] for c in cand[:5]]
            import collections

            votes = collections.Counter(y[n] for n in top5)
            pred = sorted(votes.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
            assert got[qid]["pred_label"] == pred, (qid, pred, got[qid])

    def test_cluster_quality_brute_force(self, spark, sf_dir):
        import numpy as np
        import duckdb
        from decimal import Decimal

        rows = {
            r["label"]: r
            for r in self._run(spark, sf_dir, "ext_cluster_quality").collect()
        }
        raw = duckdb.sql(
            f"SELECT label, embedding FROM '{sf_dir}/embeddings.parquet'"
        ).fetchall()
        import collections

        byl = collections.defaultdict(list)
        for lb, e in raw:
            m = [int((Decimal(str(float(x))).quantize(Decimal("0.000001")))
                     * 1_000_000) for x in e]
            byl[lb].append(m)
        cents = {}
        for lb, ms in byl.items():
            n = len(ms)
            cents[lb] = [sum(col) // n if sum(col) >= 0
                         else -((-sum(col)) // n)
                         for col in zip(*ms)]
        for lb, ms in byl.items():
            d2s = [
                sum((a - c) ** 2 for a, c in zip(m, cents[lb])) for m in ms
            ]
            mean_d2 = sum(d2s) // len(d2s)
            assert abs(rows[lb]["within_msd"] - mean_d2 / 1e12) < 1e-6
            inter = min(
                sum((a - b) ** 2 for a, b in zip(cents[lb], cents[o]))
                for o in cents
                if o != lb
            )
            assert abs(rows[lb]["min_inter_d2"] - inter / 1e12) < 1e-6
            assert rows[lb]["scatter_ratio"] > 0

    def test_coec_daily_average_is_one_ish(self, spark, sf_dir):
        rows = self._run(spark, sf_dir, "ext_coec_bias").collect()
        assert rows
        # COEC is calibrated: clicks == expected when aggregated over
        # ALL days (up to per-position micros truncation)
        tot_clicks = sum(r["clicks"] for r in rows)
        tot_exp = sum(r["expected_micros"] for r in rows) / 1e6
        assert abs(tot_clicks - tot_exp) / max(tot_clicks, 1) < 0.01
        for r in rows:
            assert 0.0 < r["coec"] < 10.0


class TestBatch15Semantics:
    """Semantic self-checks for batch 15 (ANOVA, MRR/MAP,
    Holt-Winters)."""

    def _run(self, spark, sf_dir, name):
        from proto_to_avro_ql_spark.entry_queries import QUERIES

        return QUERIES[name](spark, sf_dir)

    def test_anova_brute_force(self, spark, sf_dir):
        import duckdb
        import collections

        raw = duckdb.sql(
            f"""SELECT event_type,
                       CAST(CAST(value AS DECIMAL(38,2)) * 100 AS BIGINT)
                FROM '{sf_dir}/events.parquet' WHERE value IS NOT NULL"""
        ).fetchall()
        byg = collections.defaultdict(list)
        for t, c in raw:
            byg[t].append(c)
        r = self._run(spark, sf_dir, "ext_anova").collect()[0]
        assert r["k"] == len(byg)
        assert r["n"] == sum(len(v) for v in byg.values())
        # float reference (micros truncation makes ours differ by
        # <= k micros — compare loosely)
        gm = sum(sum(v) for v in byg.values()) / r["n"]
        ssb = sum(len(v) * (sum(v) / len(v) - gm) ** 2 for v in byg.values())
        ssw = sum(
            sum((x - sum(v) / len(v)) ** 2 for x in v) for v in byg.values()
        )
        assert abs(r["ssb"] - ssb) / max(ssb, 1) < 1e-6
        assert abs(r["ssw"] - ssw) / max(ssw, 1) < 1e-6
        f = (ssb / (r["k"] - 1)) / (ssw / (r["n"] - r["k"]))
        assert abs(r["f_stat"] - f) / max(f, 1e-9) < 1e-4
        assert r["f_stat"] >= 0

    def test_mrr_map_brute_force(self, spark, sf_dir):
        import duckdb
        import numpy as np

        rows = {
            r["query_id"]: r
            for r in self._run(spark, sf_dir, "ext_mrr_map").collect()
        }
        assert len(rows) == 20
        raw = duckdb.sql(
            f"SELECT vec_id, label, embedding"
            f" FROM '{sf_dir}/embeddings.parquet' ORDER BY vec_id"
        ).fetchall()
        ids = [r[0] for r in raw]
        y = {r[0]: r[1] for r in raw}
        X = np.array([r[2] for r in raw], dtype=np.float64)
        Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
        for qi in range(20):
            qid = ids[qi]
            sims = np.round(Xn[qi] @ Xn.T, 6)
            cand = sorted(
                ((-sims[k], ids[k]) for k in range(len(ids)) if ids[k] != qid)
            )
            top10 = [c[1] for c in cand[:10]]
            rel = [1 if y[n] == y[qid] else 0 for n in top10]
            first = next((i + 1 for i, v in enumerate(rel) if v), 0)
            r = rows[qid]
            assert r["first_rel_rank"] == first
            assert r["n_rel_top10"] == sum(rel)
            if first:
                assert abs(r["rr"] - (1_000_000 // first) / 1e6) < 1e-12
            cum = 0
            ap_num = 0
            for i, v in enumerate(rel):
                cum += v
                if v:
                    ap_num += cum * 1_000_000 // (i + 1)
            if sum(rel):
                assert abs(r["ap10"] - (ap_num // sum(rel)) / 1e6) < 1e-12

    def test_holt_winters_recurrence_and_seed(self, spark, sf_dir):
        rows = self._run(spark, sf_dir, "ext_holt_winters").collect()
        assert rows
        import collections
        import duckdb

        daily = duckdb.sql(
            f"""SELECT event_type, strftime(date_trunc('day', ts),
                       '%Y-%m-%d'), COUNT(*)
                FROM '{sf_dir}/events.parquet'
                GROUP BY 1, date_trunc('day', ts) ORDER BY 1, 2"""
        ).fetchall()
        byt = collections.defaultdict(list)
        for t, d, n in daily:
            byt[t].append((d, n))
        got = {(r["event_type"], r["day"]): r for r in rows}

        def tdiv(a, b):
            return -((-a) // b) if a < 0 else a // b

        for t, series in byt.items():
            v = [n * 1_000_000 for _, n in series]
            if len(v) < 8:
                continue
            a7 = tdiv(sum(v[:7]), 7)
            l, b = a7, 0
            s = [x - a7 for x in v[:7]]
            for i in range(7, len(v)):
                s_lag = s[0]
                l_new = tdiv(v[i] - s_lag + l + b, 2)
                b = tdiv(l_new - l + b, 2)
                s_new = tdiv(v[i] - l_new + s_lag, 2)
                l = l_new
                s = s[1:] + [s_new]
                r = got[(t, series[i][0])]
                assert r["level"] == l / 1e6
                assert r["trend"] == b / 1e6
                assert r["seasonal"] == s_new / 1e6


class TestBatch16Semantics:
    """Semantic self-checks for batch 16 (effect size, absorbing
    chains, DTW)."""

    def _run(self, spark, sf_dir, name):
        from proto_to_avro_ql_spark.entry_queries import QUERIES

        return QUERIES[name](spark, sf_dir)

    def test_effect_size_brute_force(self, spark, sf_dir):
        import duckdb
        import collections
        import statistics as st

        raw = duckdb.sql(
            f"""SELECT event_type, user_id % 2,
                       CAST(CAST(value AS DECIMAL(38,2)) * 100 AS BIGINT)
                FROM '{sf_dir}/events.parquet' WHERE value IS NOT NULL"""
        ).fetchall()
        byg = collections.defaultdict(lambda: ([], []))
        for t, a, c in raw:
            byg[t][int(a)].append(c)
        got = {
            r["event_type"]: r
            for r in self._run(spark, sf_dir, "ext_effect_size").collect()
        }
        for t, (ctrl, treat) in byg.items():
            nt, nc = len(treat), len(ctrl)
            mt, mc = st.mean(treat), st.mean(ctrl)
            ssq = sum((x - mt) ** 2 for x in treat) + sum(
                (x - mc) ** 2 for x in ctrl
            )
            sp = (ssq / (nt + nc - 2)) ** 0.5
            d = (mt - mc) / sp
            g = d * (1 - 3 / (4 * (nt + nc) - 9))
            r = got[t]
            assert (r["n_t"], r["n_c"]) == (nt, nc)
            assert abs(r["cohens_d"] - d) < 1e-9
            assert abs(r["hedges_g"] - g) < 1e-9
            # synthetic parity split: no genuine effect, but small
            # per-type samples at sf0.001 leave sampling noise — only
            # rule out a LARGE standardized effect
            assert abs(r["cohens_d"]) < 1.0

    def test_markov_absorption_fixed_point(self, spark, sf_dir):
        import duckdb
        import collections

        rows = {
            r["state"]: r
            for r in self._run(spark, sf_dir, "ext_markov_absorption").collect()
        }
        assert rows and "purchase" not in rows
        trans = duckdb.sql(
            f"""WITH seq AS (
                  SELECT event_type,
                         lag(event_type) OVER (PARTITION BY user_id
                                               ORDER BY ts, event_id) AS p
                  FROM '{sf_dir}/events.parquet')
                SELECT p, event_type, COUNT(*) FROM seq
                WHERE p IS NOT NULL AND p <> 'purchase' GROUP BY 1, 2"""
        ).fetchall()
        c = collections.defaultdict(dict)
        for src, dst, n in trans:
            c[src][dst] = n
        pm = {
            s: {d: n * 1_000_000 // sum(ds.values()) for d, n in ds.items()}
            for s, ds in ((s, c[s]) for s in c)
        }
        t = {s: 0 for s in pm}
        for _ in range(6):
            t = {
                s: 1_000_000
                + sum(p * t.get(d, 0) for d, p in pm[s].items()) // 1_000_000
                for s in pm
            }
        for s in pm:
            assert rows[s]["exp_steps_6"] == t[s] / 1e6
            assert rows[s]["p_absorb_step"] == pm[s].get("purchase", 0) / 1e6
            # expected steps lower-bounds at 1 and grows with iterations
            assert rows[s]["exp_steps_6"] >= 1.0

    def test_dtw_brute_force_and_axioms(self, spark, sf_dir):
        import duckdb
        import collections

        rows = self._run(spark, sf_dir, "ext_dtw").collect()
        assert len(rows) == 10  # C(5,2) type pairs
        daily = duckdb.sql(
            f"""SELECT event_type, date_trunc('day', ts) AS d, COUNT(*)
                FROM '{sf_dir}/events.parquet' GROUP BY 1, 2 ORDER BY 1, 2"""
        ).fetchall()
        byt = collections.defaultdict(list)
        for t, d, n in daily:
            byt[t].append(n)

        def dtw(sa, sb):
            INF = float("inf")
            prev = [INF] * (len(sb) + 1)
            prev[0] = 0
            for i in range(1, len(sa) + 1):
                cur = [INF] * (len(sb) + 1)
                for j in range(1, len(sb) + 1):
                    c = abs(sa[i - 1] - sb[j - 1])
                    cur[j] = c + min(prev[j], cur[j - 1], prev[j - 1])
                prev = cur
            return prev[-1]

        for r in rows:
            ref = dtw(byt[r["type_a"]], byt[r["type_b"]])
            assert r["dtw_cost"] == ref, (r, ref)
            # DTW lower-bounds at |sum difference|... no — but it is
            # bounded above by the pointwise L1 distance (same lengths)
            l1 = sum(
                abs(a - b)
                for a, b in zip(byt[r["type_a"]], byt[r["type_b"]])
            )
            assert r["dtw_cost"] <= l1


class TestBatch17Semantics:
    """Semantic self-checks for batch 17 (Lorenz deciles, depth-2
    tree)."""

    def _run(self, spark, sf_dir, name):
        from proto_to_avro_ql_spark.entry_queries import QUERIES

        return QUERIES[name](spark, sf_dir)

    def test_lorenz_deciles_curve(self, spark, sf_dir):
        rows = sorted(
            self._run(spark, sf_dir, "ext_lorenz_deciles").collect(),
            key=lambda r: r["decile"],
        )
        assert len(rows) == 10
        # shares sum to 1, cumulative is monotone, deciles ordered by
        # revenue desc => shares non-increasing
        assert abs(sum(r["rev_share"] for r in rows) - 1.0) < 1e-9
        assert abs(rows[-1]["cum_share"] - 1.0) < 1e-9
        for a, b in zip(rows, rows[1:]):
            assert b["cum_share"] >= a["cum_share"] - 1e-12
            assert b["rev_share"] <= a["rev_share"] + 1e-9
        # concentration: top decile holds more than 10%
        assert rows[0]["rev_share"] > 0.10
        sizes = sorted(r["n_users"] for r in rows)
        assert sizes[-1] - sizes[0] <= 1  # NTILE-equal cuts

    def test_tree_depth2_brute_force(self, spark, sf_dir):
        import duckdb
        import collections

        raw = duckdb.sql(
            f"""SELECT CAST(CAST(value AS DECIMAL(38,2)) * 100 AS BIGINT)
                         // 2500,
                       CAST(date_part('hour', ts) AS BIGINT),
                       CAST(user_id % 2 AS BIGINT)
                FROM '{sf_dir}/events.parquet' WHERE value IS NOT NULL"""
        ).fetchall()

        def best_split(pairs):
            agg = collections.defaultdict(lambda: [0, 0])
            for b, lb in pairs:
                agg[b][0] += 1
                agg[b][1] += lb
            bs = sorted(agg)
            best = None
            for t in bs[:-1]:
                n_l = sum(agg[b][0] for b in bs if b <= t)
                p_l = sum(agg[b][1] for b in bs if b <= t)
                n_r = sum(agg[b][0] for b in bs if b > t)
                p_r = sum(agg[b][1] for b in bs if b > t)
                imp = (2_000_000 * p_l * (n_l - p_l)) // n_l + (
                    2_000_000 * p_r * (n_r - p_r)
                ) // n_r
                if best is None or (imp, t) < best[:2]:
                    best = (imp, t, n_l + n_r, p_l + p_r)
            return best

        rows = {r["node"]: r for r in self._run(spark, sf_dir, "ext_tree_depth2").collect()}
        imp0, t0, n0, p0 = best_split([(vb, lb) for vb, hb, lb in raw])
        assert rows["root"]["threshold"] == t0
        assert rows["root"]["n"] == n0 and rows["root"]["pos"] == p0
        assert abs(rows["root"]["impurity"] - imp0 / 1e6) < 1e-9
        left = [(hb, lb) for vb, hb, lb in raw if vb <= t0]
        right = [(hb, lb) for vb, hb, lb in raw if vb > t0]
        for node, sub in (("left", left), ("right", right)):
            imp, t, n, p = best_split(sub)
            r = rows[node]
            assert r["threshold"] == t and r["n"] == n and r["pos"] == p
            assert abs(r["impurity"] - imp / 1e6) < 1e-9
        # children partition the root
        assert rows["left"]["n"] + rows["right"]["n"] == rows["root"]["n"]


class TestBatch18Semantics:
    """Semantic self-checks for batch 18 (sequence patterns, price
    indices)."""

    def _run(self, spark, sf_dir, name):
        from proto_to_avro_ql_spark.entry_queries import QUERIES

        return QUERIES[name](spark, sf_dir)

    def test_sequence_match_brute_force(self, spark, sf_dir):
        import duckdb
        import re
        import collections

        raw = duckdb.sql(
            f"""SELECT user_id, event_type FROM '{sf_dir}/events.parquet'
                ORDER BY user_id, ts, event_id"""
        ).fetchall()
        trails = collections.defaultdict(str)
        ch = {"click": "c", "error": "e", "purchase": "p", "signup": "s",
              "view": "v"}
        for u, t in raw:
            trails[u] += ch[t]
        pats = {
            "view_then_purchase": r"v.*p",
            "signup_view_purchase": r"s.*v.*p",
            "error_then_purchase": r"e.*p",
            "repeat_purchase": r"p.*p",
        }
        got = {
            r["pattern"]: r
            for r in self._run(spark, sf_dir, "ext_sequence_match").collect()
        }
        for name, pat in pats.items():
            n = sum(1 for t in trails.values() if re.search(pat, t))
            r = got[name]
            assert r["n_matched"] == n, (name, n, r)
            assert r["n_users"] == len(trails)
        # containment: the 3-step funnel is a subset of the 2-step one
        assert (
            got["signup_view_purchase"]["n_matched"]
            <= got["view_then_purchase"]["n_matched"]
        )

    def test_price_index_identities(self, spark, sf_dir):
        rows = sorted(
            self._run(spark, sf_dir, "ext_price_index").collect(),
            key=lambda r: r["mon"],
        )
        assert rows
        base = rows[0]
        # base month indexes to exactly 1.0 on all three formulas
        assert base["laspeyres"] == 1.0
        assert base["paasche"] == 1.0
        assert abs(base["fisher"] - 1.0) < 1e-12
        for r in rows:
            # Fisher is the geometric mean => always between L and P
            lo, hi = sorted((r["laspeyres"], r["paasche"]))
            assert lo - 1e-12 <= r["fisher"] <= hi + 1e-12
            assert r["n_parts"] > 0
            assert 0.1 < r["laspeyres"] < 10.0


class TestBatch19Semantics:
    """Semantic self-checks for batch 19 (growth accounting, RDD,
    capture-recapture)."""

    def _run(self, spark, sf_dir, name):
        from proto_to_avro_ql_spark.entry_queries import QUERIES

        return QUERIES[name](spark, sf_dir)

    def test_growth_accounting_identities(self, spark, sf_dir):
        import duckdb
        import collections

        rows = sorted(
            self._run(spark, sf_dir, "ext_growth_accounting").collect(),
            key=lambda r: r["day"],
        )
        assert rows
        # per-day composition identity
        for r in rows:
            assert r["dau"] == r["new_users"] + r["retained"] + r["resurrected"]
        # flow identity vs the raw (user, day) sets
        raw = duckdb.sql(
            f"""SELECT DISTINCT user_id,
                       strftime(date_trunc('day', ts), '%Y-%m-%d')
                FROM '{sf_dir}/events.parquet'"""
        ).fetchall()
        byday = collections.defaultdict(set)
        for u, d in raw:
            byday[d].add(u)
        days = sorted(byday)
        got = {r["day"]: r for r in rows}
        first_seen = {}
        for d in days:
            for u in byday[d]:
                first_seen.setdefault(u, d)
        for prev, cur in zip(days, days[1:]):
            r = got[cur]
            assert r["dau"] == len(byday[cur])
            assert r["retained"] == len(byday[cur] & byday[prev])
            assert r["churned"] == len(byday[prev] - byday[cur])
            assert r["new_users"] == sum(
                1 for u in byday[cur] if first_seen[u] == cur
            )
            # dau_t = dau_{t-1} - churned + new + resurrected
            assert r["dau"] == len(byday[prev]) - r["churned"] + r[
                "new_users"
            ] + r["resurrected"]

    def test_rdd_brute_force(self, spark, sf_dir):
        import duckdb

        raw = duckdb.sql(
            f"""SELECT CAST(CAST(value AS DECIMAL(38,2)) * 100 AS BIGINT)
                         - 25000,
                       CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
                FROM '{sf_dir}/events.parquet' WHERE value IS NOT NULL"""
        ).fetchall()
        pts = [(x, y) for x, y in raw if abs(x) <= 10000]
        r = self._run(spark, sf_dir, "ext_rdd").collect()[0]

        def fit(side):
            n = len(side)
            sx = sum(x for x, _ in side)
            sy = sum(y for _, y in side)
            sxx = sum(x * x for x, _ in side)
            sxy = sum(x * y for x, y in side)
            b = (n * sxy - sx * sy) / (n * sxx - sx * sx)
            a = (sy - b * sx) / n
            return n, b, a

        nb, bb, ab_ = fit([p for p in pts if p[0] < 0])
        na, ba, aa = fit([p for p in pts if p[0] >= 0])
        assert (r["n_below"], r["n_above"]) == (nb, na)
        assert abs(r["slope_below"] - bb) < 1e-12
        assert abs(r["slope_above"] - ba) < 1e-12
        assert abs(r["rd_effect"] - (aa - ab_)) < 1e-12
        # parity labels are value-independent: no genuine discontinuity
        assert abs(r["rd_effect"]) < 0.5

    def test_capture_recapture_brute_force(self, spark, sf_dir):
        import duckdb

        raw = duckdb.sql(
            f"""SELECT user_id,
                       MAX(CASE WHEN date_part('day', ts) <= 15
                           THEN 1 ELSE 0 END),
                       MAX(CASE WHEN date_part('day', ts) > 15
                           THEN 1 ELSE 0 END)
                FROM '{sf_dir}/events.parquet' GROUP BY 1"""
        ).fetchall()
        n1 = sum(a for _, a, b in raw)
        n2 = sum(b for _, a, b in raw)
        m = sum(a * b for _, a, b in raw)
        r = self._run(spark, sf_dir, "ext_capture_recapture").collect()[0]
        assert (r["n1"], r["n2"], r["m"], r["observed"]) == (
            n1, n2, m, len(raw),
        )
        nhat = (n1 + 1) * (n2 + 1) / (m + 1) - 1
        assert abs(r["chapman_estimate"] - nhat) < 1e-9
        # estimate at least covers the observed population
        assert r["chapman_estimate"] >= r["observed"] - 1
        assert 0.0 < r["coverage"] <= 1.01


class TestBatch20Semantics:
    """Semantic self-checks for batch 20 (cohort LTV, scenario grid,
    audience overlap)."""

    def _run(self, spark, sf_dir, name):
        from proto_to_avro_ql_spark.entry_queries import QUERIES

        return QUERIES[name](spark, sf_dir)

    def test_cohort_ltv_monotone_and_totals(self, spark, sf_dir):
        import duckdb
        import collections

        rows = self._run(spark, sf_dir, "ext_cohort_ltv").collect()
        assert rows
        byc = collections.defaultdict(list)
        for r in rows:
            byc[r["cohort"]].append(r)
        total_rev = duckdb.sql(
            f"""SELECT CAST(COALESCE(SUM(CAST(value AS DECIMAL(38,2)) * 100),
                       0) AS BIGINT)
                FROM '{sf_dir}/events.parquet'"""
        ).fetchone()[0]
        grand = 0
        for c, rs in byc.items():
            rs.sort(key=lambda r: r["age"])
            assert rs[0]["age"] == 0  # cohort day itself is age 0
            for a, b in zip(rs, rs[1:]):
                assert b["cum_rev_cents"] >= a["cum_rev_cents"]
                assert b["ltv_per_user"] >= a["ltv_per_user"] - 1e-12
            assert rs[-1]["cum_rev_cents"] == sum(r["rev_cents"] for r in rs)
            grand += rs[-1]["cum_rev_cents"]
        assert grand == total_rev  # cohorts partition all revenue

    def test_scenario_grid_ordering(self, spark, sf_dir):
        rows = {
            (r["md"], r["mt"]): r["revenue"]
            for r in self._run(spark, sf_dir, "ext_scenario_grid").collect()
        }
        assert len(rows) == 9
        # more discount => less revenue; more tax => more gross
        for mt in (90, 100, 110):
            assert rows[(90, mt)] > rows[(100, mt)] > rows[(110, mt)]
        for md in (90, 100, 110):
            assert rows[(md, 110)] > rows[(md, 100)] > rows[(md, 90)]
        # baseline scenario ~= the classic revenue aggregate
        import duckdb

        ref = duckdb.sql(
            f"""SELECT SUM(l_extendedprice * (1 - l_discount)
                           * (1 + l_tax))
                FROM '{sf_dir}/lineitem.parquet'"""
        ).fetchone()[0]
        assert abs(rows[(100, 100)] - ref) / ref < 1e-6

    def test_audience_overlap_brute_force(self, spark, sf_dir):
        import duckdb
        import collections

        raw = duckdb.sql(
            f"SELECT DISTINCT user_id, event_type"
            f" FROM '{sf_dir}/events.parquet'"
        ).fetchall()
        aud = collections.defaultdict(set)
        for u, t in raw:
            aud[t].add(u)
        rows = self._run(spark, sf_dir, "ext_audience_overlap").collect()
        assert len(rows) == 10
        for r in rows:
            A, B = aud[r["type_a"]], aud[r["type_b"]]
            assert r["n_a"] == len(A) and r["n_b"] == len(B)
            assert r["n_both"] == len(A & B)
            assert abs(r["jaccard"] - len(A & B) / len(A | B)) < 1e-12


class TestBatch21Semantics:
    """Semantic self-checks for batch 21 (ABC classes, peaks,
    elasticity)."""

    def _run(self, spark, sf_dir, name):
        from proto_to_avro_ql_spark.entry_queries import QUERIES

        return QUERIES[name](spark, sf_dir)

    def test_abc_brute_force(self, spark, sf_dir):
        import duckdb

        pr = duckdb.sql(
            f"""SELECT l_partkey,
                       CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,2)) * 100)
                            AS BIGINT)
                FROM '{sf_dir}/lineitem.parquet' GROUP BY 1"""
        ).fetchall()
        pr.sort(key=lambda r: (-r[1], r[0]))
        tot = sum(c for _, c in pr)
        import collections

        ref = collections.defaultdict(lambda: [0, 0])
        cum = 0
        for _, c in pr:
            cls = "A" if cum * 100 < tot * 80 else (
                "B" if cum * 100 < tot * 95 else "C"
            )
            ref[cls][0] += 1
            ref[cls][1] += c
            cum += c
        got = {r["abc_class"]: r for r in self._run(spark, sf_dir, "ext_abc_analysis").collect()}
        for cls, (n, cents) in ref.items():
            assert got[cls]["n_parts"] == n
            assert got[cls]["revenue_cents"] == cents
        assert set(got) == set(ref)
        # A captures at least 80% of revenue
        assert got["A"]["rev_share"] >= 0.80

    def test_peak_detection_brute_force(self, spark, sf_dir):
        import duckdb
        import collections

        daily = duckdb.sql(
            f"""SELECT event_type, strftime(date_trunc('day', ts),
                       '%Y-%m-%d'), COUNT(*)
                FROM '{sf_dir}/events.parquet'
                GROUP BY 1, date_trunc('day', ts) ORDER BY 1, 2"""
        ).fetchall()
        byt = collections.defaultdict(list)
        for t, d, n in daily:
            byt[t].append((d, n))
        expect = set()
        for t, series in byt.items():
            for i in range(2, len(series) - 2):
                nb = max(
                    series[i - 1][1], series[i - 2][1],
                    series[i + 1][1], series[i + 2][1],
                )
                if series[i][1] > nb:
                    expect.add((t, series[i][0]))
        got = {
            (r["event_type"], r["day"])
            for r in self._run(spark, sf_dir, "ext_peak_detection").collect()
        }
        assert got == expect

    def test_elasticity_plausible(self, spark, sf_dir):
        r = self._run(spark, sf_dir, "ext_elasticity").collect()[0]
        assert r["n_parts"] > 0
        assert 0.0 <= r["r2"] <= 1.0
        # TPC-H quantities are independent of price => elasticity near
        # zero, never strongly positive or negative
        assert abs(r["elasticity"]) < 1.0


class TestBatch22Semantics:
    """Semantic self-checks for batch 22 (factorial effects, novelty
    curve)."""

    def _run(self, spark, sf_dir, name):
        from proto_to_avro_ql_spark.entry_queries import QUERIES

        return QUERIES[name](spark, sf_dir)

    def test_factorial_effects_brute_force(self, spark, sf_dir):
        import duckdb
        import collections

        raw = duckdb.sql(
            f"""SELECT user_id % 2, (user_id // 2) % 2,
                       CAST(CAST(value AS DECIMAL(38,2)) * 100 AS BIGINT)
                FROM '{sf_dir}/events.parquet' WHERE value IS NOT NULL"""
        ).fetchall()
        cells = collections.defaultdict(list)
        for a, b, c in raw:
            cells[(int(a), int(b))].append(c)
        m = {k: sum(v) / len(v) for k, v in cells.items()}
        r = self._run(spark, sf_dir, "ext_factorial_effects").collect()[0]
        assert r["n"] == len(raw)
        for (a, b), mean in m.items():
            assert abs(r[f"m{a}{b}"] - mean) < 1e-9
        ea = (m[(1, 1)] + m[(1, 0)]) / 2 - (m[(0, 1)] + m[(0, 0)]) / 2
        eb = (m[(1, 1)] + m[(0, 1)]) / 2 - (m[(1, 0)] + m[(0, 0)]) / 2
        ix = (m[(1, 1)] - m[(1, 0)] - m[(0, 1)] + m[(0, 0)]) / 2
        assert abs(r["effect_a"] - ea) < 1e-9
        assert abs(r["effect_b"] - eb) < 1e-9
        assert abs(r["interaction"] - ix) < 1e-9

    def test_novelty_curve_invariants(self, spark, sf_dir):
        rows = sorted(
            self._run(spark, sf_dir, "ext_novelty_curve").collect(),
            key=lambda r: r["batch"],
        )
        assert rows
        # batch 0 is all-new by definition
        assert rows[0]["n_new"] == rows[0]["n_distinct"]
        assert abs(rows[0]["novelty_rate"] - 1.0) < 1e-12
        for r in rows:
            assert 0 <= r["n_new"] <= r["n_distinct"] <= r["n_shingles"]
            assert 0.0 <= r["novelty_rate"] <= 1.0
        # total new across batches = global distinct shingles
        import duckdb

        tot_distinct = duckdb.sql(
            rf"""WITH toks AS (
                  SELECT string_split(trim(regexp_replace(lower(text),
                         '\s+', ' ', 'g')), ' ') AS ws
                  FROM '{sf_dir}/documents.parquet')
                SELECT COUNT(DISTINCT concat_ws(' ', ws[i.i], ws[i.i+1],
                       ws[i.i+2], ws[i.i+3], ws[i.i+4]))
                FROM toks CROSS JOIN LATERAL (
                  SELECT unnest(generate_series(1, len(ws) - 4)) AS i) i
                WHERE len(ws) >= 5"""
        ).fetchone()[0]
        # md5-prefix collisions can only SHRINK the hash-distinct count
        assert sum(r["n_new"] for r in rows) <= tot_distinct
        assert sum(r["n_new"] for r in rows) >= tot_distinct * 0.99


class TestBatch23Semantics:
    """Semantic self-checks for batch 23 (Fleiss kappa, seasonal MK)."""

    def _run(self, spark, sf_dir, name):
        from proto_to_avro_ql_spark.entry_queries import QUERIES

        return QUERIES[name](spark, sf_dir)

    def test_fleiss_kappa_brute_force(self, spark, sf_dir):
        import duckdb
        import collections

        raw = duckdb.sql(
            f"""WITH r AS (
                  SELECT date_trunc('day', ts) AS d, event_type,
                         row_number() OVER (PARTITION BY date_trunc('day', ts)
                                            ORDER BY ts, event_id) AS rn
                  FROM '{sf_dir}/events.parquet')
                SELECT d, event_type FROM r WHERE rn <= 20"""
        ).fetchall()
        byd = collections.defaultdict(list)
        for d, t in raw:
            byd[d].append(t)
        items = {d: v for d, v in byd.items() if len(v) == 20}
        n = 20
        N = len(items)
        p_i_num = 0
        cat = collections.Counter()
        for d, v in items.items():
            c = collections.Counter(v)
            p_i_num += sum(k * k for k in c.values()) - n
            cat.update(c)
        p_bar = p_i_num / (N * n * (n - 1))
        p_e = sum(t * t for t in cat.values()) / (N * n) ** 2
        kappa = (p_bar - p_e) / (1 - p_e)
        r = self._run(spark, sf_dir, "ext_fleiss_kappa").collect()[0]
        assert r["n_items"] == N
        assert abs(r["p_bar"] - p_bar) < 1e-9
        assert abs(r["p_e"] - p_e) < 1e-9
        assert abs(r["fleiss_kappa"] - kappa) < 1e-9
        # event types are ~uniform and independent of day: agreement
        # near chance, kappa near 0
        assert abs(r["fleiss_kappa"]) < 0.2

    def test_seasonal_mk_brute_force(self, spark, sf_dir):
        import duckdb
        import collections

        daily = duckdb.sql(
            f"""SELECT event_type, date_trunc('day', ts) AS d, COUNT(*)
                FROM '{sf_dir}/events.parquet' GROUP BY 1, 2 ORDER BY 1, 2"""
        ).fetchall()
        byts = collections.defaultdict(list)
        for t, d, n in daily:
            byts[(t, d.weekday())].append(n)
        S = collections.defaultdict(int)
        V18 = collections.defaultdict(int)
        strata = collections.defaultdict(int)
        for (t, wd), ns in byts.items():
            s = sum(
                (ns[j] > ns[i]) - (ns[j] < ns[i])
                for i in range(len(ns))
                for j in range(i + 1, len(ns))
            )
            S[t] += s
            nw = len(ns)
            ties = collections.Counter(ns)
            V18[t] += nw * (nw - 1) * (2 * nw + 5) - sum(
                c * (c - 1) * (2 * c + 5) for c in ties.values()
            )
            strata[t] += 1
        got = {
            r["event_type"]: r
            for r in self._run(spark, sf_dir, "ext_seasonal_mk").collect()
        }
        for t in S:
            r = got[t]
            assert r["s_total"] == S[t]
            assert r["n_strata"] == strata[t]
            assert abs(r["var_s"] - V18[t] / 18.0) < 1e-9
            var = V18[t] / 18.0
            if S[t] > 0:
                assert abs(r["z"] - (S[t] - 1) / var**0.5) < 1e-9
            elif S[t] < 0:
                assert abs(r["z"] - (S[t] + 1) / var**0.5) < 1e-9


class TestBatch24Semantics:
    """Semantic self-check for batch 24 (activity streaks)."""

    def test_streaks_brute_force(self, spark, sf_dir):
        from proto_to_avro_ql_spark.entry_queries import QUERIES
        import duckdb
        import collections
        from datetime import timedelta

        raw = duckdb.sql(
            f"""SELECT DISTINCT user_id, date_trunc('day', ts)
                FROM '{sf_dir}/events.parquet' ORDER BY 1, 2"""
        ).fetchall()
        byu = collections.defaultdict(list)
        for u, d in raw:
            byu[u].append(d)
        hist = collections.Counter()
        for u, days in byu.items():
            longest = cur = 1
            for a, b in zip(days, days[1:]):
                cur = cur + 1 if b - a == timedelta(days=1) else 1
                longest = max(longest, cur)
            hist[longest] += 1
        got = {
            r["longest_streak"]: r["n_users"]
            for r in QUERIES["ext_streaks"](spark, sf_dir).collect()
        }
        assert got == dict(hist)
        assert sum(got.values()) == len(byu)


class TestBatch25Semantics:
    """Semantic self-check for batch 25 (stickiness panel)."""

    def test_stickiness_brute_force(self, spark, sf_dir):
        from proto_to_avro_ql_spark.entry_queries import QUERIES
        import duckdb
        import collections
        from datetime import timedelta

        raw = duckdb.sql(
            f"""SELECT DISTINCT user_id, date_trunc('day', ts)
                FROM '{sf_dir}/events.parquet'"""
        ).fetchall()
        byd = collections.defaultdict(set)
        for u, d in raw:
            byd[d.date() if hasattr(d, "date") else d].add(u)
        days = sorted(byd)
        got = {r["day"]: r for r in QUERIES["ext_stickiness"](spark, sf_dir).collect()}
        for d in days:
            wau = set()
            mau = set()
            for k in range(28):
                dd = d - timedelta(days=k)
                if dd in byd:
                    mau |= byd[dd]
                    if k < 7:
                        wau |= byd[dd]
            r = got[d.strftime("%Y-%m-%d")]
            assert r["dau"] == len(byd[d])
            assert r["wau"] == len(wau)
            assert r["mau"] == len(mau)
            # ordering invariants
            assert r["dau"] <= r["wau"] <= r["mau"]
            assert 0.0 < r["stickiness"] <= 1.0


class TestBatch26Semantics:
    """Semantic self-checks for batch 26 (XYZ classes, burn rate)."""

    def _run(self, spark, sf_dir, name):
        from proto_to_avro_ql_spark.entry_queries import QUERIES

        return QUERIES[name](spark, sf_dir)

    def test_xyz_brute_force(self, spark, sf_dir):
        import duckdb
        import collections

        pm = duckdb.sql(
            f"""SELECT l_partkey, strftime(date_trunc('month', l_shipdate),
                       '%Y-%m'),
                       CAST(SUM(CAST(l_quantity AS DECIMAL(38,2))) AS BIGINT)
                FROM '{sf_dir}/lineitem.parquet' GROUP BY 1, 2"""
        ).fetchall()
        byp = collections.defaultdict(list)
        for pk, mon, q in pm:
            byp[pk].append(q)
        ref = collections.Counter()
        for pk, qs in byp.items():
            if len(qs) < 3:
                continue
            n = len(qs)
            mean = sum(qs) / n
            var = sum((q - mean) ** 2 for q in qs) / n
            cv = var**0.5 / mean
            ref["X" if cv < 0.5 else ("Y" if cv < 1.0 else "Z")] += 1
        got = {
            r["xyz_class"]: r["n_parts"]
            for r in self._run(spark, sf_dir, "ext_xyz_analysis").collect()
        }
        assert got == dict(ref)

    def test_burn_rate_brute_force(self, spark, sf_dir):
        import duckdb

        hourly = duckdb.sql(
            f"""SELECT date_trunc('hour', ts), COUNT(*),
                       SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                FROM '{sf_dir}/events.parquet' GROUP BY 1 ORDER BY 1"""
        ).fetchall()
        rows = {
            r["hour"]: r
            for r in self._run(spark, sf_dir, "ext_burn_rate").collect()
        }
        assert len(rows) == len(hourly) - 5
        for i in range(5, len(hourly)):
            h, n, errs = hourly[i]
            n6 = sum(x[1] for x in hourly[i - 5 : i + 1])
            e6 = sum(x[2] for x in hourly[i - 5 : i + 1])
            r = rows[h.strftime("%Y-%m-%d %H:00")]
            assert r["rate1_ppm"] == errs * 1_000_000 // n
            assert r["rate6_ppm"] == e6 * 1_000_000 // n6
            assert r["page_alert"] == (
                errs * 4 > n * 2 and e6 * 4 > n6 * 1
            )
            # burn is bounded by all-errors / 25% budget = 4x (tiny
            # sf0.001 hours can hit it)
            assert 0.0 <= r["burn_1h"] <= 4.0


class TestBatch27Semantics:
    """Semantic self-check for batch 27 (bitmap index)."""

    def test_bitmap_counts_match_direct_filters(self, spark, sf_dir):
        from proto_to_avro_ql_spark.entry_queries import QUERIES
        import duckdb

        rows = QUERIES["ext_bitmap_index"](spark, sf_dir).collect()
        assert rows
        for r in rows:
            direct = duckdb.sql(
                f"""SELECT COUNT(*) FROM '{sf_dir}/documents.parquet'
                    WHERE lang = '{r["lang"]}'
                      AND source = '{r["source"]}'"""
            ).fetchone()[0]
            assert r["n_docs"] == direct, (r, direct)
            assert r["n_blocks_touched"] >= 1
        # top-2 langs x top-3 sources = 6 conjunctions
        assert len(rows) == 6


class TestBatch28Semantics:
    """Semantic self-check for batch 28 (paired t-test)."""

    def test_paired_ttest_brute_force(self, spark, sf_dir):
        from proto_to_avro_ql_spark.entry_queries import QUERIES
        import duckdb
        import statistics as st

        raw = duckdb.sql(
            f"""SELECT user_id,
                       CAST(COALESCE(SUM(CASE WHEN date_part('day', ts) <= 15
                         THEN CAST(value AS DECIMAL(38,2)) * 100 END), 0)
                         AS BIGINT),
                       CAST(COALESCE(SUM(CASE WHEN date_part('day', ts) > 15
                         THEN CAST(value AS DECIMAL(38,2)) * 100 END), 0)
                         AS BIGINT),
                       MAX(CASE WHEN date_part('day', ts) <= 15
                           THEN 1 ELSE 0 END),
                       MAX(CASE WHEN date_part('day', ts) > 15
                           THEN 1 ELSE 0 END)
                FROM '{sf_dir}/events.parquet' WHERE value IS NOT NULL
                GROUP BY 1"""
        ).fetchall()
        diffs = [y - x for _, x, y, a, b in raw if a and b]
        r = QUERIES["ext_paired_ttest"](spark, sf_dir).collect()[0]
        assert r["n_pairs"] == len(diffs)
        mean_d = st.mean(diffs)
        assert abs(r["mean_diff"] - mean_d / 100) < 1e-9
        t = mean_d / (st.stdev(diffs) / len(diffs) ** 0.5)
        assert abs(r["t_stat"] - t) < 1e-9
        # no genuine pre/post shift in synthetic data
        assert abs(r["t_stat"]) < 5.0


class TestBatch29Semantics:
    """Semantic self-check for batch 29 (EB shrinkage)."""

    def test_eb_shrinkage_pulls_toward_prior(self, spark, sf_dir):
        from proto_to_avro_ql_spark.entry_queries import QUERIES

        rows = QUERIES["ext_eb_shrinkage"](spark, sf_dir).collect()
        assert rows
        sx = sum(r["x"] for r in rows)
        sn = sum(r["n"] for r in rows)
        pbar = (sx * 1_000_000 // sn) / 1e6
        for r in rows:
            assert 0.0 <= r["weight"] <= 1.0
            # shrunk rate lies BETWEEN the raw rate and the prior
            lo, hi = sorted((r["raw_rate"], pbar))
            assert lo - 1e-9 <= r["shrunk_rate"] <= hi + 1e-9
            # the posterior-mean identity
            expect = r["weight"] * r["raw_rate"] + (1 - r["weight"]) * pbar
            assert abs(r["shrunk_rate"] - expect) < 1e-9
        # bigger n => bigger weight (monotone in n)
        by_n = sorted(rows, key=lambda r: r["n"])
        for a, b in zip(by_n, by_n[1:]):
            assert b["weight"] >= a["weight"] - 1e-12


class TestBatch30Semantics:
    """Semantic self-check for batch 30 (cross-correlation)."""

    def test_ccf_brute_force(self, spark, sf_dir):
        from proto_to_avro_ql_spark.entry_queries import QUERIES
        import duckdb

        daily = duckdb.sql(
            f"""SELECT date_trunc('day', ts),
                       SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END),
                       SUM(CASE WHEN event_type = 'purchase'
                           THEN 1 ELSE 0 END)
                FROM '{sf_dir}/events.parquet' GROUP BY 1 ORDER BY 1"""
        ).fetchall()
        xs = {d: x for d, x, y in daily}
        ys = {d: y for d, x, y in daily}
        from datetime import timedelta

        rows = {
            r["lag"]: r
            for r in QUERIES["ext_cross_correlation"](spark, sf_dir).collect()
        }
        assert set(rows) == set(range(-3, 4))
        for lag in range(-3, 4):
            pts = [
                (xs[d], ys[d + timedelta(days=lag)])
                for d in xs
                if d + timedelta(days=lag) in ys
            ]
            n = len(pts)
            sx = sum(p[0] for p in pts)
            sy = sum(p[1] for p in pts)
            sxx = sum(p[0] ** 2 for p in pts)
            syy = sum(p[1] ** 2 for p in pts)
            sxy = sum(p[0] * p[1] for p in pts)
            ref = (n * sxy - sx * sy) / (
                (n * sxx - sx * sx) * (n * syy - sy * sy)
            ) ** 0.5
            r = rows[lag]
            assert r["n_days"] == n
            assert abs(r["ccf"] - ref) < 1e-9
            assert -1.0 <= r["ccf"] <= 1.0


class TestBatch31Semantics:
    """Semantic self-check for batch 31 (Hurst exponent)."""

    def test_hurst_brute_force(self, spark, sf_dir):
        from proto_to_avro_ql_spark.entry_queries import QUERIES
        import duckdb
        import collections
        import math

        daily = duckdb.sql(
            f"""SELECT event_type, date_trunc('day', ts), COUNT(*)
                FROM '{sf_dir}/events.parquet' GROUP BY 1, 2 ORDER BY 1, 2"""
        ).fetchall()
        byt = collections.defaultdict(list)
        for t, d, n in daily:
            byt[t].append(n)
        got = {
            r["event_type"]: r
            for r in QUERIES["ext_hurst"](spark, sf_dir).collect()
        }
        for t, ys in byt.items():
            pts = []
            for w in (5, 10, 15):
                rss = []
                for k in range(len(ys) // w):
                    win = ys[k * w : (k + 1) * w]
                    s = sum(win)
                    s2 = sum(v * v for v in win)
                    run = 0
                    devs = []
                    for j, v in enumerate(win):
                        run += v
                        devs.append(w * run - (j + 1) * s)
                    r_scaled = max(devs) - min(devs)
                    var_scaled = w * s2 - s * s
                    if var_scaled > 0:
                        rs = round(r_scaled / var_scaled**0.5, 6)
                        rss.append(int(rs * 10**6 + 0.5) if rs >= 0 else 0)
                if rss:
                    mean6 = sum(rss) // len(rss)
                    if mean6 > 0:
                        pts.append(
                            (round(math.log(w), 6), round(math.log(mean6 / 1e6), 6))
                        )
            if len(pts) < 2:
                assert t not in got
                continue
            n = len(pts)
            sx = sum(p[0] for p in pts)
            sy = sum(p[1] for p in pts)
            sxy = sum(p[0] * p[1] for p in pts)
            sxx = sum(p[0] ** 2 for p in pts)
            ref = (n * sxy - sx * sy) / (n * sxx - sx * sx)
            r = got[t]
            assert r["n_scales"] == n
            # rounding at the micros/ln steps: compare to 1e-4
            assert abs(r["hurst"] - ref) < 1e-3, (t, r["hurst"], ref)
            # Hurst lives in (0, 1) for a counting series
            assert 0.0 < r["hurst"] < 1.2


class TestBatch33Semantics:
    """Semantic self-check for batch 33 (V-pattern recognition)."""

    def test_vshape_brute_force(self, spark, sf_dir):
        from proto_to_avro_ql_spark.entry_queries import QUERIES
        import duckdb
        import collections

        daily = duckdb.sql(
            f"""SELECT event_type, strftime(date_trunc('day', ts),
                       '%Y-%m-%d'), COUNT(*)
                FROM '{sf_dir}/events.parquet'
                GROUP BY 1, date_trunc('day', ts) ORDER BY 1, 2"""
        ).fetchall()
        byt = collections.defaultdict(list)
        for t, d, n in daily:
            byt[t].append((d, n))
        expect = set()
        for t, series in byt.items():
            dirs = []
            for (d0, a), (d1, b) in zip(series, series[1:]):
                dirs.append((d1, 1 if b > a else (-1 if b < a else 0)))
            # maximal runs of same nonzero dir over CONSECUTIVE move
            # days (the dense daily grid makes moves contiguous unless
            # a flat day intervenes)
            runs = []
            for d, s in dirs:
                if s == 0:
                    runs.append(None)
                elif runs and runs[-1] and runs[-1][0] == s:
                    runs[-1][2] = d
                else:
                    runs.append([s, d, d])
            runs = [r for r in runs if r]
            by_day = dict(series)
            for r1, r2 in zip(runs, runs[1:]):
                if r1[0] == -1 and r2[0] == 1:
                    # adjacency: r2's first move day follows r1's last
                    days = [d for d, _ in series]
                    i1 = days.index(r1[2])
                    if days.index(r2[1]) == i1 + 1:
                        # full measures, not just the trough: peak_n is
                        # the value the day BEFORE the decline's first
                        # move day (the run's prev_n anchor) — this is
                        # exactly what flat-day merging corrupted
                        expect.add(
                            (
                                t,
                                r1[1],           # decline_start
                                r1[2],           # trough
                                r2[2],           # recovery_end
                                by_day[days[days.index(r1[1]) - 1]],
                                by_day[r1[2]],   # trough_n
                                by_day[r2[2]],   # recovered_n
                            )
                        )
        rows = QUERIES["ext_match_pattern"](spark, sf_dir).collect()
        got = {
            (
                r["event_type"],
                r["decline_start"],
                r["trough"],
                r["recovery_end"],
                r["peak_n"],
                r["trough_n"],
                r["recovered_n"],
            )
            for r in rows
        }
        assert got == expect
        for r in rows:
            assert r["depth"] == r["peak_n"] - r["trough_n"] > 0
            assert r["recovery"] == r["recovered_n"] - r["trough_n"] > 0
            assert r["decline_start"] <= r["trough"] < r["recovery_end"]


class TestBatch34Semantics:
    """Semantic self-check for batch 34 (feature-importance screen)."""

    def test_feature_importance_vs_best_split(self, spark, sf_dir):
        from proto_to_avro_ql_spark.entry_queries import QUERIES

        rows = {
            r["feature"]: r
            for r in QUERIES["ext_feature_importance"](spark, sf_dir).collect()
        }
        assert set(rows) == {"value_bucket", "hour", "dow", "id_hash"}
        # the value_bucket row must agree with ext_best_split's winner
        bs = QUERIES["ext_best_split"](spark, sf_dir).collect()
        winner = next(r for r in bs if r["is_best"])
        assert rows["value_bucket"]["best_split"] == winner["split"]
        assert (
            abs(rows["value_bucket"]["impurity"] - winner["impurity"]) < 1e-9
        )
        for r in rows.values():
            assert r["gain_micros"] >= 0  # a split never increases Gini
