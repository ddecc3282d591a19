"""Trigram substring/regex index (index.trigram) vs brute scans.

Oracle discipline: every indexed answer is compared row-for-row against a
pure-Catalyst full scan of the same corpus with the same predicate — the
trigram layer may only PRUNE, never change the answer."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from mtix_spark.index.trigram import (
    GRAMS_PER_NEEDLE,
    TrigramPaths,
    _grams_of,
    build_trigram_index,
    grep_regex,
    grep_substring,
    mandatory_literals,
    required_gram_groups,
    split_alternation,
)


@pytest.fixture(scope="module")
def tri_index(spark, small_docs, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("tri") / "tri")
    return build_trigram_index(spark, small_docs, out, n_segments=6)


def _brute_substring(spark, base, needles):
    ndf = spark.createDataFrame(needles, "query_id long, needle string")
    return (
        base.crossJoin(F.broadcast(ndf))
        .filter(F.contains("content", "needle"))
        .select(
            "query_id",
            "doc_id",
            (
                (
                    F.length("content")
                    - F.length(
                        F.replace(F.col("content"), F.col("needle"), F.lit(""))
                    )
                )
                / F.length("needle")
            )
            .cast("long")
            .alias("n_occ"),
        )
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


class TestSubstring:
    def test_random_needles_match_brute(self, spark, small_docs, tri_index):
        base = small_docs.select("doc_id", "content")
        rng = random.Random(7)
        texts = [r["content"] for r in base.limit(40).collect()]
        needles = []
        for qid in range(12):
            t = texts[rng.randrange(len(texts))]
            i = rng.randrange(max(1, len(t) - 20))
            needles.append((qid, t[i : i + rng.randint(3, 18)]))
        # absent + fallback-length needles in the same batch
        needles += [(100, "zz_never_in_corpus_zz"), (101, "ab"), (102, "q")]
        got = _rows(grep_substring(spark, tri_index, base, needles))
        exp = _rows(_brute_substring(spark, base, needles))
        assert got == exp
        assert len(got) > 0

    def test_occurrence_counts_non_overlapping(self, spark, tri_index):
        docs = spark.createDataFrame(
            [(0, "abcabcabc xx"), (1, "no hits here"), (2, "abc")],
            "doc_id long, content string",
        )
        # the tiny corpus is NOT what tri_index indexed — candidates come
        # from the shared index, so verify against a private index
        out = _rows(_brute_substring(spark, docs, [(1, "abc")]))
        assert out == [(1, 0, 3), (1, 2, 1)]

    def test_empty_and_all_absent(self, spark, small_docs, tri_index):
        base = small_docs.select("doc_id", "content")
        got = grep_substring(
            spark, tri_index, base, [(1, "qqqxyzzy_absent")]
        )
        assert got.count() == 0
        got2 = grep_substring(spark, tri_index, base, [])
        assert got2.count() == 0
        assert [f.name for f in got2.schema.fields] == [
            "query_id",
            "doc_id",
            "n_occ",
        ]

    def test_candidates_prune_not_scan(self, spark, small_docs, tri_index):
        """The pruned path must touch FAR fewer docs than the corpus: a
        needle taken verbatim from one doc yields candidates ~= true hits,
        and the posting read plan pushes the gram IN-filter to parquet."""
        from mtix_spark.index.trigram import _candidates

        base = small_docs.select("doc_id", "content")
        text = base.limit(1).collect()[0]["content"]
        needle = text[5:35]
        cand, cand_bound = _candidates(
            spark, tri_index, [(1, 0, _grams_of(needle))]
        )
        n_cand = cand.count()
        n_true = base.filter(F.contains("content", F.lit(needle))).count()
        assert n_true >= 1
        assert n_cand <= max(5, 3 * n_true)  # tight over-approximation
        assert cand_bound >= n_cand  # the driver-side bound is sound
        plan = spark.read.parquet(tri_index.postings).filter(
            F.col("gram").isin(_grams_of(needle)[:GRAMS_PER_NEEDLE])
        )._jdf.queryExecution().executedPlan().toString()
        assert "PushedFilters: [In(gram" in plan

    def test_parallelism_invariance(self, spark, small_docs, tmp_path):
        """Different segment counts -> byte-identical answers."""
        base = small_docs.select("doc_id", "content")
        needle = base.limit(1).collect()[0]["content"][8:24]
        p3 = build_trigram_index(
            spark, small_docs, str(tmp_path / "t3"), n_segments=3
        )
        p11 = build_trigram_index(
            spark, small_docs, str(tmp_path / "t11"), n_segments=11
        )
        a = _rows(grep_substring(spark, p3, base, [(1, needle)]))
        b = _rows(grep_substring(spark, p11, base, [(1, needle)]))
        assert a == b and len(a) >= 1

    def test_verify_join_gate(self, spark, small_docs, tri_index, monkeypatch):
        """Candidate-bound gate: under the bound the corpus scan absorbs a
        BROADCAST of the candidates (content never exchanges); forcing the
        bound to 0 flips to the shuffle path — identical rows either way."""
        import mtix_spark.index.trigram as T

        base = small_docs.select("doc_id", "content")
        needle = base.limit(1).collect()[0]["content"][5:25]

        def plan_of(df):
            return df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "simple"
                )
            )

        bcast = grep_substring(spark, tri_index, base, [(1, needle)])
        p = plan_of(bcast)
        assert "BroadcastHashJoin [doc_id" in p
        assert "Exchange hashpartitioning(doc_id" not in p

        monkeypatch.setattr(T, "BROADCAST_CANDIDATE_ROWS", 0)
        shuf = grep_substring(spark, tri_index, base, [(1, needle)])
        p2 = plan_of(shuf)
        assert "Exchange hashpartitioning(doc_id" in p2  # pinned wide verify
        assert _rows(bcast) == _rows(shuf) and len(_rows(bcast)) >= 1


class TestCaseInsensitive:
    def test_case_variants(self):
        from mtix_spark.index.trigram import _case_variants

        assert _case_variants("a1b") == ["A1B", "A1b", "a1B", "a1b"]
        assert _case_variants("12 ") == ["12 "]
        assert len(_case_variants("abc")) == 8

    def test_icase_matches_brute(self, spark, small_docs, tri_index):
        base = small_docs.select("doc_id", "content")
        text = base.limit(1).collect()[0]["content"]
        frag = text[4:16]
        scrambled = "".join(
            c.upper() if i % 2 else c.lower() for i, c in enumerate(frag)
        )
        qs = [(1, scrambled), (2, frag.upper()), (3, "ZZ_ABSENT")]
        got = _rows(
            grep_substring(spark, tri_index, base, qs, case_insensitive=True)
        )
        ndf = spark.createDataFrame(
            [(q, s.lower()) for q, s in qs], "query_id long, needle string"
        )
        exp = _rows(
            base.crossJoin(F.broadcast(ndf))
            .filter(F.contains(F.lower("content"), F.col("needle")))
            .select(
                "query_id",
                "doc_id",
                (
                    (
                        F.length("content")
                        - F.length(
                            F.replace(
                                F.lower(F.col("content")),
                                F.col("needle"),
                                F.lit(""),
                            )
                        )
                    )
                    / F.length("needle")
                )
                .cast("long")
                .alias("n_occ"),
            )
        )
        assert got == exp
        assert len(got) >= 2  # both cased probes found the original doc
        # the same scrambled needle finds NOTHING case-sensitively
        cs = grep_substring(spark, tri_index, base, [(1, scrambled)])
        assert cs.count() == 0

    def test_inline_flag_pattern_falls_back_correctly(
        self, spark, small_docs, tri_index
    ):
        assert required_gram_groups("(?i)foobar") is None
        assert required_gram_groups("(?im)x(abc)y") is None
        base = small_docs.select("doc_id", "content")
        word = base.limit(1).collect()[0]["content"].split()[0]
        pat = f"(?i){word.upper()}"
        got = _rows(grep_regex(spark, tri_index, base, [(1, pat)]))
        exp = _rows(
            base.filter(F.regexp_like(F.col("content"), F.lit(pat))).select(
                F.lit(1).alias("query_id"), "doc_id"
            )
        )
        assert got == exp and len(got) >= 1


class TestRegexLiterals:
    def test_split_alternation(self):
        assert split_alternation("foo|ba(r|z)") == ["foo", "ba(r|z)"]
        assert split_alternation("a\\|b") == ["a\\|b"]
        assert split_alternation("[|]x") == ["[|]x"]

    @pytest.mark.parametrize(
        "pattern,expected",
        [
            ("merge [a-z]+ part", ["merge ", " part"]),
            ("abc+d", ["ab", "d"]),
            ("a(bc)*def", ["a", "def"]),
            ("foo\\.bar", ["foo.bar"]),
            ("^start.*end$", ["start", "end"]),
            ("ab{2,3}c", ["a", "c"]),
            ("x\\d+y", ["x", "y"]),
            ("lit\\*eral", ["lit*eral"]),
        ],
    )
    def test_mandatory_literals(self, pattern, expected):
        assert mandatory_literals(pattern) == expected

    def test_literals_truly_mandatory(self):
        """Safety property: every extracted literal must occur in every
        string the pattern matches (spot-checked on generated matches)."""
        import re

        cases = {
            "merge [a-z]+ part": ["merge abc part", "xmerge zz party"],
            "a(bc)*def": ["adef", "abcbcdefx"],
            "x\\d+y": ["qx12yq", "x0y"],
            "ab{2,3}c": ["abbc", "zabbbcz"],
        }
        for pat, matches in cases.items():
            lits = mandatory_literals(pat)
            for m in matches:
                assert re.search(pat, m), (pat, m)
                for lit in lits:
                    assert lit in m, (pat, lit, m)

    def test_required_gram_groups(self):
        assert required_gram_groups("[0-9]{3}") is None  # no literal >= 3
        assert required_gram_groups("ab|cdef") is None  # branch 'ab' too short
        gg = required_gram_groups("foobar|bazqux")
        assert gg == [["bar", "foo", "oba", "oob"], ["azq", "baz", "qux", "zqu"]]


class TestRegexSearch:
    def test_patterns_match_brute(self, spark, small_docs, tri_index):
        base = small_docs.select("doc_id", "content")
        text = base.limit(1).collect()[0]["content"]
        w = text.split()
        pats = [
            (1, f"{w[0]} [A-Za-z0-9_]+ {w[2]}"),
            (2, f"{w[1]}|{w[3]}"),
            (3, "[0-9]{4}"),  # fallback: no mandatory literal
            (4, "never_matching_literal_xyz[0-9]*"),
        ]
        got = _rows(grep_regex(spark, tri_index, base, pats))
        pdf_ = spark.createDataFrame(pats, "query_id long, pat string")
        exp = _rows(
            base.crossJoin(F.broadcast(pdf_))
            .filter(F.regexp_like(F.col("content"), F.col("pat")))
            .select("query_id", "doc_id")
        )
        assert got == exp
        assert len(got) > 0
        assert any(q == 1 for q, _ in got)  # pruned branch produced rows

    def test_alternation_union_of_branches(self, spark, small_docs, tri_index):
        base = small_docs.select("doc_id", "content")
        rows = base.limit(2).collect()
        n1, n2 = rows[0]["content"][3:12], rows[1]["content"][3:12]
        import re

        pat = f"{re.escape(n1)}|{re.escape(n2)}"
        got = _rows(grep_regex(spark, tri_index, base, [(1, pat)]))
        exp = _rows(
            base.filter(
                F.contains("content", F.lit(n1))
                | F.contains("content", F.lit(n2))
            ).select(F.lit(1).alias("query_id"), "doc_id")
        )
        assert got == exp and len(got) >= 2
