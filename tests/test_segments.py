from __future__ import annotations

from pyspark.sql import functions as F

from proto_to_avro_ql_spark.operators.segments import (
    chunk_documents,
    reassemble_kept,
    segment_dedup_stats,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestChunkDocuments:
    def test_window_count_and_overlap(self, spark):
        text = " ".join(f"t{i}" for i in range(100))
        out = chunk_documents(_docs(spark, [(1, text)]), size=50, stride=40).collect()
        # starts 0,40,80 → 3 windows; last is short (20 tokens)
        assert [r.chunk_idx for r in sorted(out, key=lambda r: r.chunk_idx)] == [0, 1, 2]
        by_idx = {r.chunk_idx: r for r in out}
        assert by_idx[0].chunk_tokens == 50 and by_idx[2].chunk_tokens == 20
        # overlap: last 10 tokens of window 0 == first 10 of window 1
        assert by_idx[0].chunk_text.split()[-10:] == by_idx[1].chunk_text.split()[:10]

    def test_short_doc_single_window(self, spark):
        out = chunk_documents(_docs(spark, [(1, "a b c")]), size=50, stride=40).collect()
        assert len(out) == 1 and out[0].chunk_tokens == 3

    def test_blank_doc_yields_no_chunks(self, spark):
        out = chunk_documents(
            _docs(spark, [(1, "   "), (2, "")]), size=50, stride=40
        ).collect()
        assert out == []

    def test_chunks_cover_all_tokens_exactly_when_stride_equals_size(self, spark):
        text = " ".join(f"w{i}" for i in range(73))
        out = chunk_documents(_docs(spark, [(7, text)]), size=25, stride=25)
        stitched = (
            out.orderBy("chunk_idx")
            .agg(F.array_join(F.collect_list("chunk_text"), " ").alias("t"))
            .first()
            .t
        )
        assert stitched == text


class TestSegmentDedup:
    def test_duplicate_doc_loses_all_segments(self, spark):
        text = " ".join(f"t{i}" for i in range(50))
        stats = {
            r.doc_id: r
            for r in segment_dedup_stats(
                _docs(spark, [(1, text), (2, text)]), seg_size=25
            ).collect()
        }
        assert stats[1].n_kept == stats[1].n_segments == 2
        assert stats[2].n_kept == 0 and stats[2].n_segments == 2
        assert stats[2].kept_ratio == 0.0

    def test_partial_overlap_keeps_novel_segment(self, spark):
        shared = " ".join(f"s{i}" for i in range(25))
        novel = " ".join(f"n{i}" for i in range(25))
        stats = {
            r.doc_id: r
            for r in segment_dedup_stats(
                _docs(spark, [(1, shared), (2, shared + " " + novel)]), seg_size=25
            ).collect()
        }
        assert stats[1].n_kept == 1
        assert stats[2].n_segments == 2 and stats[2].n_kept == 1

    def test_reassemble_drops_only_repeats(self, spark):
        shared = " ".join(f"s{i}" for i in range(25))
        novel = " ".join(f"n{i}" for i in range(25))
        out = {
            r.doc_id: r.kept_text
            for r in reassemble_kept(
                _docs(spark, [(1, shared), (2, shared + " " + novel)]), seg_size=25
            ).collect()
        }
        assert out[1] == shared
        assert out[2] == novel  # its copy of `shared` was the second occurrence

    def test_unique_corpus_reassembles_identically(self, spark):
        rows = [(i, " ".join(f"d{i}w{j}" for j in range(60))) for i in range(5)]
        out = {r.doc_id: r.kept_text for r in reassemble_kept(_docs(spark, rows), seg_size=25).collect()}
        assert out == dict(rows)


class TestUnicodeSegments:
    def test_unicode_tokens_chunk_and_dedup(self, spark):
        """Multi-byte tokens must chunk on characters, not bytes, and
        hash stably (md5 of UTF-8) for the dedup decision."""
        text = "héllo wörld 你好 мир " * 10  # 40 tokens
        docs = spark.createDataFrame(
            [(1, text.strip()), (2, text.strip())], "doc_id long, text string"
        )
        chunks = chunk_documents(docs, size=25, stride=25).collect()
        assert {r.doc_id for r in chunks} == {1, 2}
        assert all("你好" in r.chunk_text for r in chunks if r.chunk_idx == 0)
        stats = {
            r.doc_id: r for r in segment_dedup_stats(docs, seg_size=25).collect()
        }
        assert stats[2].n_kept == 0  # doc 2 is an exact dup of doc 1
