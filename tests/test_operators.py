"""Tests for distributed analytics operators (textops, dedup family,
similarity search, multimodal plumbing, sources)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from web_scrapper_spark.operators import dedup as dd
from web_scrapper_spark.operators import multimodal as mm
from web_scrapper_spark.operators import similarity as sim
from web_scrapper_spark.operators import textops as tx


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").persist()


@pytest.fixture(scope="module")
def embeddings(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").persist()


class TestTextops:
    def test_corpus_keywords_match_pure_python(self, docs):
        from web_scrapper_spark.textutils import STOP_WORDS
        import re

        top = tx.corpus_keywords_topk(docs, k=10).collect()
        rows = docs.select("text").collect()
        freq = {}
        for r in rows:
            for w in re.split(r"[^a-z0-9_]+", r["text"].lower()):
                if w and len(w) > 2 and w not in STOP_WORDS:
                    freq[w] = freq.get(w, 0) + 1
        expected = sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
        assert [(r["word"], r["freq"]) for r in top] == expected

    def test_doc_keywords_rank_bounded(self, docs):
        out = tx.doc_keywords_topk(docs, k=3)
        assert out.groupBy("doc_id").count().agg(F.max("count")).first()[0] <= 3

    def test_doc_stats_sane(self, docs):
        stats = tx.doc_stats(docs).collect()
        for r in stats:
            assert r["word_count"] >= 0
            assert 0.0 <= r["punct_ratio"] <= 1.0
            assert 0.0 <= r["stopword_ratio"] <= 1.0
            assert 0.0 <= r["quality_score"] <= 1.0
            assert r["reading_time_min"] >= 1

    def test_language_id_deterministic(self, spark):
        df = spark.createDataFrame(
            [
                (1, "the cat and the dog is in that house with food"),
                (2, "der hund und die katze ist nicht mit ein haus"),
                (3, "le chat est dans la maison pour les amis"),
                (4, "xyzzy qwerty plugh"),
            ],
            "doc_id long, text string",
        )
        out = {r["doc_id"]: r["lang_pred"] for r in tx.language_id(df).collect()}
        assert out == {1: "en", 2: "de", 3: "fr", 4: "und"}

    def test_paragraph_language_split(self, spark):
        en1 = "the cat and the dog is in that house"
        de1 = "der hund und die katze ist nicht mit ein haus"
        fr1 = "le chat est dans la maison pour les amis"
        en2 = "this is the end of the story and that is all"
        df = spark.createDataFrame(
            [
                (1, f"{en1}\n{de1}\n\n  \n{en2}"),   # blanks dropped
                (2, f"{de1}\n{fr1}"),                # nothing kept
                (3, "xyzzy qwerty plugh"),           # no markers: und
            ],
            "doc_id long, text string",
        )
        out = {r["doc_id"]: r for r in tx.paragraph_language_id(df).collect()}
        r1 = out[1]
        assert (r1["n_paras"], r1["n_kept"], r1["n_en"], r1["n_de"]) == (
            3, 2, 2, 1,
        )
        assert r1["doc_lang"] == "en"
        assert r1["text_kept"] == f"{en1}\n{en2}"    # document order, byte-exact
        r2 = out[2]
        assert (r2["n_kept"], r2["text_kept"]) == (0, "")
        assert r2["doc_lang"] in ("de", "fr")
        assert (r2["n_de"], r2["n_fr"]) == (1, 1)
        assert r2["doc_lang"] == "de"                # LANG_ORDER precedence
        r3 = out[3]
        assert (r3["n_paras"], r3["doc_lang"], r3["text_kept"]) == (
            1, "und", "",
        )

    def test_intra_doc_line_dedup(self, spark):
        text1 = (
            "Alpha beta gamma.\n"
            "Subscribe now!\n"
            "  \n"                      # blank: dropped, uncounted
            "Delta epsilon.\n"
            "SUBSCRIBE   NOW!\n"        # case/space variant: dup
            "Alpha beta gamma.\n"       # exact dup
            "Zeta eta."
        )
        df = spark.createDataFrame(
            [(1, text1), (2, "only line"), (3, "")],
            "doc_id long, text string",
        )
        out = {r["doc_id"]: r for r in tx.intra_doc_line_dedup(df).collect()}
        r1 = out[1]
        assert (r1["n_lines"], r1["n_dropped"]) == (6, 2)
        assert r1["text_fixed"] == (
            "Alpha beta gamma.\nSubscribe now!\nDelta epsilon.\nZeta eta."
        )
        assert (out[2]["n_lines"], out[2]["n_dropped"]) == (1, 0)
        assert out[2]["text_fixed"] == "only line"
        assert (out[3]["n_lines"], out[3]["text_fixed"]) == (0, "")

    def test_fingerprint_equals_md5(self, spark):
        df = spark.createDataFrame(
            [(1, "Hello  World"), (2, "hello world")], "doc_id long, text string"
        )
        out = {r["doc_id"]: r["fingerprint"] for r in tx.fingerprint(df).collect()}
        import hashlib

        assert out[1] == out[2] == hashlib.md5(b"hello world").hexdigest()

    def test_winnow_matches_pure_python(self, spark):
        """Spark winnowing == straight-line reference implementation."""
        import hashlib
        import re

        def ref_winnow(text, k=3, w=4):
            toks = [t for t in re.split(r"[^a-z0-9_]+", text.lower()) if t]
            grams = (
                [" ".join(toks)]
                if 0 < len(toks) < k
                else [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
            )
            grams = [g for g in grams if g]
            h = [
                int(hashlib.md5(g.encode()).hexdigest()[:15], 16) % 2147483647
                for g in grams
            ]
            if not h:
                return set()
            if len(h) < w:
                return {min(h)}
            return {min(h[i : i + w]) for i in range(len(h) - w + 1)}

        texts = [
            "the quick brown fox jumps over the lazy dog again and again",
            "short doc",
            "a b c d e f g h i j k l m n o p",
            "",
        ]
        df = spark.createDataFrame(
            list(enumerate(texts)), "doc_id long, text string"
        )
        rows = tx.winnow_fingerprints(df, k=3, w=4).collect()
        got = {}
        for r in rows:
            got.setdefault(r["doc_id"], set()).add(r["fp"])
        for i, t in enumerate(texts):
            assert got.get(i, set()) == ref_winnow(t), f"doc {i}"

    def test_winnow_shared_run_guarantee(self, spark):
        """Winnowing's core property: documents sharing a run of
        >= w+k-1 tokens share at least one fingerprint."""
        shared = "alpha beta gamma delta epsilon zeta"  # 6 tokens = w+k-1
        df = spark.createDataFrame(
            [
                (1, f"unrelated prefix words here {shared} and a suffix"),
                (2, f"{shared} totally different continuation tokens"),
                (3, "nothing in common with either document at all"),
            ],
            "doc_id long, text string",
        )
        rows = tx.winnow_fingerprints(df, k=3, w=4).collect()
        fps = {}
        for r in rows:
            fps.setdefault(r["doc_id"], set()).add(r["fp"])
        assert fps[1] & fps[2], "shared 6-token run must share a fingerprint"

    def test_winnow_overlap_pairs(self, spark):
        """Docs sharing a long run pair up; boilerplate fps (present in
        every doc) are capped out by max_df and create no pairs."""
        shared = "alpha beta gamma delta epsilon zeta eta theta"
        boiler = "site footer copyright terms privacy contact"
        df = spark.createDataFrame(
            [
                (1, f"one unique intro {shared} tail a {boiler}"),
                (2, f"{shared} two other continuation words {boiler}"),
                (3, f"three completely different body text here {boiler}"),
                (4, f"four nothing shared with anyone else at all {boiler}"),
            ],
            "doc_id long, text string",
        )
        rows = tx.winnow_overlap_pairs(df, min_shared=2, max_df=3).collect()
        pairs = {(r["id_a"], r["id_b"]) for r in rows}
        assert (1, 2) in pairs
        assert all(p == (1, 2) for p in pairs), pairs

    def test_pii_redact(self, spark):
        df = spark.createDataFrame(
            [
                (1, "mail a.b+c@site.co.uk or call (555) 867-5309 now"),
                (2, "server 192.168.10.1 charged 4111 1111 1111 1234 ok"),
                (3, "intl +1 800-555-1234 and 10.0.0.1 and x@y.io"),
                (4, "nothing sensitive here"),
            ],
            "doc_id long, text string",
        )
        rows = {r["doc_id"]: r for r in tx.pii_redact(df).collect()}
        assert rows[1]["redacted"] == "mail <EMAIL> or call <PHONE> now"
        assert (rows[1]["n_email"], rows[1]["n_phone"]) == (1, 1)
        assert rows[2]["redacted"] == "server <IP> charged <CC> ok"
        assert (rows[2]["n_cc"], rows[2]["n_ip"]) == (1, 1)
        assert rows[3]["redacted"] == "intl <PHONE> and <IP> and <EMAIL>"
        assert rows[4]["redacted"] == "nothing sensitive here"
        assert (
            rows[4]["n_email"] + rows[4]["n_cc"] + rows[4]["n_ip"] + rows[4]["n_phone"]
        ) == 0

    def test_token_count_bpe(self, spark):
        df = spark.createDataFrame([(1, "Hello, world! x2")], "doc_id long, text string")
        row = tx.token_count_bpe(df).first()
        # ["Hello", ",", "world", "!", "x", "2"] — letter/digit runs split
        assert row["bpe_token_count"] == 6
        assert row["word_token_count"] == 3

    def test_validator_columns(self, spark):
        df = spark.createDataFrame(
            [
                ("a@real.org", "212-867-5309", "https://x.org/a", "192.168.0.1", "2025-07-18"),
                ("bad@example.com", "1234567890", "gopher://x", "999.0.0.1", "not a date"),
            ],
            "email string, phone string, url string, ip string, d string",
        )
        rows = df.select(
            tx.email_valid_col(F.col("email")).alias("e"),
            tx.phone_valid_col(F.col("phone")).alias("p"),
            tx.url_valid_col(F.col("url")).alias("u"),
            tx.ip_valid_col(F.col("ip")).alias("i"),
            tx.date_valid_col(F.col("d")).alias("d"),
        ).collect()
        assert [tuple(r) for r in rows] == [
            (True, True, True, True, True),
            (False, False, False, False, False),
        ]

    def test_price_parse_col(self, spark):
        df = spark.createDataFrame(
            [("$12.34",), ("12,34 €",), ("99",), ("none",)], "p string"
        )
        vals = [r[0] for r in df.select(tx.price_parse_col(F.col("p"))).collect()]
        assert vals == [12.34, 12.34, 99.0, None]


class TestDedup:
    def test_exact_dedup(self, spark):
        df = spark.createDataFrame(
            [(1, "Same  Text"), (2, "same text"), (3, "other")],
            "doc_id long, text string",
        )
        rows = {r["keep_id"]: r["dup_count"] for r in dd.dedup_exact(df).collect()}
        assert rows == {1: 2, 3: 1}

    def test_minhash_finds_near_dups(self, spark):
        base = "the quick brown fox jumps over the lazy dog again and again today"
        near = base.replace("today", "tomorrow")
        far = "completely different words describing spark shuffle partitions nicely"
        df = spark.createDataFrame(
            [(1, base), (2, near), (3, far)], "doc_id long, text string"
        )
        pairs = dd.minhash_lsh_pairs(df, jaccard_threshold=0.4).collect()
        assert [(p["id_a"], p["id_b"]) for p in pairs] == [(1, 2)]
        # exact jaccard verified against a hand computation
        def shingles(t):
            toks = [w for w in t.lower().split() if w]
            return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}

        expect = len(shingles(base) & shingles(near)) / len(shingles(base) | shingles(near))
        assert pairs[0]["jaccard"] == round(expect, 6)

    def test_simhash_properties(self, spark):
        df = spark.createDataFrame(
            [(1, "alpha beta gamma delta"), (2, "alpha beta gamma delta"), (3, "zzz yyy xxx www")],
            "doc_id long, text string",
        )
        out = {r["doc_id"]: r["simhash"] for r in dd.simhash_df(df).collect()}
        assert out[1] == out[2] != out[3]
        assert out[1] == dd.simhash64("alpha beta gamma delta")

    def test_simhash_near_pairs(self, spark):
        base = " ".join(f"w{i}" for i in range(60))
        near = base.replace("w3 ", "w3x ")
        df = spark.createDataFrame(
            [(1, base), (2, near), (3, "unrelated totally different text")],
            "doc_id long, text string",
        )
        pairs = dd.simhash_near_pairs(df, max_hamming=8).collect()
        ids = {(p["id_a"], p["id_b"]) for p in pairs}
        assert (1, 2) in ids
        assert not any(3 in p for p in ids)

    def test_embedding_near_pairs(self, spark):
        rows = [
            (1, [1.0, 0.0, 0.0], 0),
            (2, [0.999, 0.01, 0.0], 0),
            (3, [0.0, 1.0, 0.0], 0),
            (4, [1.0, 0.0, 0.0], 1),  # other block: never paired with 1
        ]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
        pairs = dd.embedding_near_pairs(df, threshold=0.99).collect()
        assert [(p["id_a"], p["id_b"]) for p in pairs] == [(1, 2)]


class TestSemDeDup:
    def _centroids(self, spark, rows):
        return spark.createDataFrame(
            rows, "cell_id int, centroid array<double>"
        )

    def test_keeper_is_least_central(self, spark):
        # cluster around x-axis: 10,11,12 mutually near-dup; 12 is the
        # furthest from the centroid -> the one kept
        rows = [
            (10, [1.0, 0.0]),
            (11, [0.9999, 0.01]),
            (12, [0.97, 0.24]),
            (20, [0.0, 1.0]),  # other cell, untouched
        ]
        emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        cents = self._centroids(spark, [(0, [1.0, 0.0]), (1, [0.0, 1.0])])
        out = {r["vec_id"]: r for r in dd.semdedup(emb, cents, eps=0.05).collect()}
        assert out[10]["component"] == out[11]["component"] == out[12]["component"] == 10
        kept = [v for v in (10, 11, 12) if out[v]["is_kept"]]
        assert kept == [12]
        assert out[20]["is_kept"] and out[20]["component"] == 20

    def test_matches_numpy_simulation(self, spark, embeddings):
        eps = 0.7  # loose so sf0.001 produces real duplicate groups
        emb_rows = embeddings.collect()
        w = {}
        for r in sorted(emb_rows, key=lambda r: r["vec_id"]):
            w.setdefault(r["label"], r)  # medoid = min vec_id per label
        cents = self._centroids(
            spark,
            [(lbl, [float(x) for x in r["embedding"]]) for lbl, r in sorted(w.items())],
        )
        out = {r["vec_id"]: r for r in dd.semdedup(embeddings, cents, eps=eps).collect()}

        def cos(a, b):
            na, nb = np.linalg.norm(a), np.linalg.norm(b)
            return float(a @ b / (na * nb)) if na > 0 and nb > 0 else -2.0

        cent_np = {lbl: np.array(r["embedding"], dtype=np.float64) for lbl, r in w.items()}
        vec_np = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64) for r in emb_rows}
        # assignment: argmax cosine over all centroids, ties by cell_id
        assign = {}
        for vid, v in vec_np.items():
            best = max(
                sorted(cent_np), key=lambda l: (cos(v, cent_np[l]), -l)
            )
            assign[vid] = best
        for vid, r in out.items():
            assert r["cell_id"] == assign[vid], vid
        # pairs + union-find + keeper
        parent = {vid: vid for vid in vec_np}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        ids = sorted(vec_np)
        for i, a in enumerate(ids):
            for b in ids[i + 1 :]:
                if assign[a] == assign[b] and cos(vec_np[a], vec_np[b]) >= 1 - eps:
                    ra, rb = find(a), find(b)
                    if ra != rb:
                        parent[max(ra, rb)] = min(ra, rb)
        groups = {}
        for vid in ids:
            groups.setdefault(find(vid), []).append(vid)
        n_dup_groups = 0
        for root, members in groups.items():
            for m in members:
                assert out[m]["component"] == root, (m, root)
            if len(members) == 1:
                assert out[members[0]]["is_kept"]
            else:
                n_dup_groups += 1
                keeper = min(
                    members,
                    key=lambda m: (cos(vec_np[m], cent_np[assign[m]]), m),
                )
                for m in members:
                    assert out[m]["is_kept"] == (m == keeper), (m, keeper)
        assert n_dup_groups > 0, "fixture produced no duplicate groups — loosen eps"

    def test_bad_eps(self, spark, embeddings):
        with pytest.raises(ValueError):
            dd.semdedup(embeddings, embeddings, eps=0.0)


class TestSimilarity:
    def test_exact_topk_matches_numpy(self, embeddings):
        queries = embeddings.limit(5).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        out = sim.cosine_topk(queries, embeddings, k=5).collect()
        emb = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64) for r in embeddings.collect()}
        qids = {r["query_id"] for r in out}
        for qid in qids:
            got = [(r["rank"], r["vec_id"]) for r in out if r["query_id"] == qid]
            got.sort()
            q = emb[qid]
            scores = {
                vid: float(q @ v / (np.linalg.norm(q) * np.linalg.norm(v)))
                for vid, v in emb.items()
            }
            expect = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
            assert [vid for _, vid in got] == [vid for vid, _ in expect]
            # self-match first at cos≈1
            assert got[0][1] == qid

    def test_ivf_recall_monotone_and_exact_at_full_probe(self, embeddings):
        queries = embeddings.limit(20).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        exact = sim.cosine_topk(queries, embeddings, k=10).persist()
        n_cells = embeddings.select("label").distinct().count()
        r1 = sim.recall_at_k(sim.ivf_topk(queries, embeddings, k=10, n_probe=1), exact)
        r3 = sim.recall_at_k(sim.ivf_topk(queries, embeddings, k=10, n_probe=3), exact)
        r_all = sim.recall_at_k(
            sim.ivf_topk(queries, embeddings, k=10, n_probe=n_cells), exact
        )
        assert r1 <= r3 <= r_all  # more probes never hurt
        assert r3 >= 0.4          # partial probe recovers a solid share
        assert r_all == 1.0       # probing every cell == exact search

    def test_assign_cells_plan_free_of_centroid_literals(self, spark):
        # the round-2 scale-killer: centroids embedded as plan
        # LITERALS (one expression node per component — plan compile
        # dies at real IVF cell counts). The quantizer must travel as
        # a sparkContext broadcast into a narrow Arrow map stage, so
        # the plan is O(1) in C and carries no centroid values.
        import contextlib
        import io

        sentinel = 123456.789
        cents = spark.createDataFrame(
            [(i, [sentinel + i, float(i), 1.0]) for i in range(8)],
            "cell_id long, centroid array<double>",
        )
        vecs = spark.createDataFrame(
            [(1, [1.0, 2.0, 3.0]), (2, [0.5, 0.1, 0.9])],
            "vec_id long, embedding array<double>",
        )
        out = sim.assign_cells(vecs, cents, n_probe=2)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            out.explain(True)
        plan = buf.getvalue()
        assert "123456" not in plan          # no per-centroid literals
        assert "MapInPandas" in plan         # the Arrow map stage
        assert "Exchange hashpartitioning" not in plan

    def test_assign_cells_bounded_at_large_cell_count(self, spark):
        # C = 4096 cells x 16 dims: the literal plan died here (plan
        # build alone exploded); the broadcast path must finish in
        # bounded time and assign each vector to its own generator cell
        import time

        n_cells, dim = 4096, 16
        # distinct deterministic directions: one-hot + a pseudo-random
        # offset mod a prime > n_cells, so no two centroids coincide
        cent_rows = [
            (c, [((c * 31 + i * 17) % 4099) / 4099.0
                 + (1.0 if i == c % dim else 0.0)
                 for i in range(dim)])
            for c in range(n_cells)
        ]
        cents = spark.createDataFrame(
            cent_rows, "cell_id long, centroid array<double>"
        )
        vec_ids = list(range(0, n_cells, 16))  # 256 probes
        vecs = spark.createDataFrame(
            [(c, cent_rows[c][1]) for c in vec_ids],
            "vec_id long, embedding array<double>",
        )
        t0 = time.monotonic()
        got = {
            r["vec_id"]: r["cell_id"]
            for r in sim.assign_cells(vecs, cents, n_probe=1).collect()
        }
        elapsed = time.monotonic() - t0
        assert got == {c: c for c in vec_ids}
        assert elapsed < 120  # literal-plan form never finished here

    def test_assign_cells_tie_null_and_mismatch_semantics(self, spark):
        # exact ties break to the LOWER cell_id; NULL / zero /
        # dimension-mismatched vectors score -2 everywhere and land in
        # the lowest cell_ids
        cents = spark.createDataFrame(
            [(5, [1.0, 0.0]), (9, [1.0, 0.0]), (11, [0.0, 1.0])],
            "cell_id long, centroid array<double>",
        )
        vecs = spark.createDataFrame(
            [(1, [2.0, 0.0]), (2, None), (3, [0.0, 0.0]),
             (4, [1.0, 1.0, 1.0])],
            "vec_id long, embedding array<double>",
        )
        one = {
            r["vec_id"]: r["cell_id"]
            for r in sim.assign_cells(vecs, cents, n_probe=1).collect()
        }
        assert one == {1: 5, 2: 5, 3: 5, 4: 5}
        two = {}
        for r in sim.assign_cells(vecs, cents, n_probe=2).collect():
            two.setdefault(r["vec_id"], []).append(r["cell_id"])
        assert two[1] == [5, 9] and two[2] == [5, 9]

    def test_assign_cells_rejects_bad_inputs(self, spark):
        cents = spark.createDataFrame(
            [], "cell_id long, centroid array<double>"
        )
        vecs = spark.createDataFrame(
            [(1, [1.0])], "vec_id long, embedding array<double>"
        )
        with pytest.raises(ValueError):
            sim.assign_cells(vecs, cents)
        good = spark.createDataFrame(
            [(1, [1.0])], "cell_id long, centroid array<double>"
        )
        with pytest.raises(ValueError):
            sim.assign_cells(vecs, good, n_probe=0)


class TestMultimodal:
    def setup_method(self):
        mm.clear_decoders()

    def test_no_decoder_raises(self, spark):
        media = mm.synthetic_media_df(spark, n=4)
        with pytest.raises(Exception) as err:
            mm.image_features_df(media).collect()
        assert "no decoder registered" in str(err.value)

    def test_fake_decoder_pipeline(self, spark):
        mm.register_decoder("image", mm.deterministic_fake_decoder)
        media = mm.synthetic_media_df(spark, n=6)
        rows = mm.image_features_df(media, resize_to=4).orderBy("media_id").collect()
        assert len(rows) == 6
        for r in rows:
            assert len(r["feature"]) == 16
            assert 0 <= r["mean_luma"] <= 255
        # deterministic across runs
        again = mm.image_features_df(media, resize_to=4).orderBy("media_id").collect()
        assert [r["feature"] for r in rows] == [r["feature"] for r in again]

    def test_frame_sampling(self, spark):
        media = mm.synthetic_media_df(spark, n=5, kind="video")
        frames = mm.frame_sample_df(media, every_n=2).collect()
        metas = {r["media_id"]: r["meta"]["n_frames"] for r in media.collect()}
        by_media = {}
        for f in frames:
            by_media.setdefault(f["media_id"], []).append(f["frame_idx"])
        for mid, idxs in by_media.items():
            assert idxs == list(range(0, metas[mid], 2))


class TestSources:
    def test_roundtrip_formats(self, spark, tmp_path):
        from web_scrapper_spark.sources import export_data, read_any, write_any

        df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
        write_any(df, str(tmp_path / "x.csv"), "csv")
        n = export_data(spark, str(tmp_path / "x.csv"), "csv", str(tmp_path / "x.json"), "json")
        assert n == 2
        back = read_any(spark, str(tmp_path / "x.json"), "json")
        assert {(r["id"], r["v"]) for r in back.collect()} == {(1, "a"), (2, "b")}

    def test_db_format_falls_back_loudly_without_driver(self, spark, tmp_path):
        # S10: no JDBC jar in this sandbox — 'db' must warn LOUDLY and
        # write readable parquet, never silently alias
        import warnings

        from web_scrapper_spark.sources import read_any, write_any

        df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
        path = str(tmp_path / "dbsink")
        with warnings.catch_warnings(record=True) as caught:
            warnings.simplefilter("always")
            write_any(df, path, "db", table="items")
        assert any("JDBC driver" in str(w.message) for w in caught)
        with warnings.catch_warnings(record=True) as caught:
            warnings.simplefilter("always")
            back = read_any(spark, path, "database", table="items")
        assert any("JDBC driver" in str(w.message) for w in caught)
        assert back.count() == 2

    def test_sqlite_roundtrip_real_database(self, spark, tmp_path):
        # S10's in-sandbox REAL leg: sqlite needs no jar. The written
        # file must be a genuine sqlite database (verified by opening
        # it with the stdlib directly), and the roundtrip preserves
        # ints, floats, text, blobs and NULLs.
        import sqlite3

        from web_scrapper_spark.sources import read_any, write_any

        df = spark.createDataFrame(
            [(1, 1.5, "a", bytearray(b"\x00\x01"), None),
             (2, None, "b", None, "x")],
            "id long, score double, v string, payload binary, extra string",
        )
        path = str(tmp_path / "real.db")
        write_any(df, path, "sqlite", table="items")
        con = sqlite3.connect(path)
        try:
            rows = con.execute(
                "SELECT id, score, v, payload, extra FROM items "
                "ORDER BY id"
            ).fetchall()
        finally:
            con.close()
        assert rows[0] == (1, 1.5, "a", b"\x00\x01", None)
        assert rows[1] == (2, None, "b", None, "x")
        back = read_any(spark, path, "sqlite", table="items")
        got = sorted(map(tuple, back.collect()))
        assert got[0][0] == 1 and got[0][3] == bytearray(b"\x00\x01")
        assert back.count() == 2
        # append mode accumulates; query pushdown filters in sqlite
        write_any(df, path, "sqlite", table="items", mode="append")
        assert read_any(spark, path, "sqlite", table="items").count() == 4
        one = read_any(
            spark, path, "sqlite",
            query="SELECT id FROM items WHERE id = 1",
        )
        assert one.count() == 2 and one.columns == ["id"]

    def test_db_format_serves_sqlite_urls_without_jar(self, spark, tmp_path):
        # 'db' + a sqlite url = the reference's DEFAULT engine, served
        # for real (no warning, no parquet fallback)
        import warnings as _warnings

        from web_scrapper_spark.sources import read_any, write_any

        df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
        url = f"sqlite:///{tmp_path}/ref.db"
        with _warnings.catch_warnings(record=True) as caught:
            _warnings.simplefilter("always")
            write_any(df, url, "db", table="items")
            back = read_any(spark, url, "database", table="items")
        assert not [w for w in caught if "JDBC" in str(w.message)]
        assert sorted(map(tuple, back.collect())) == [(1, "a"), (2, "b")]
        # missing table still refuses loudly
        import pytest as _pytest

        with _pytest.raises(ValueError, match="table"):
            write_any(df, url, "db")

    def test_sqlite_mixed_storage_class_columns(self, spark, tmp_path):
        # Review fix (round 4): sqlite columns are DYNAMICALLY typed —
        # one column can hold INTEGER, REAL, TEXT and BLOB rows at
        # once. Inference must scan every row and promote (int-only →
        # long, int/real → double, mixed-with-text → string with
        # str()-converted cells) instead of trusting the first
        # non-null value and letting createDataFrame explode.
        import sqlite3

        from web_scrapper_spark.sources.sqlitedb import read_sqlite

        path = str(tmp_path / "mixed.db")
        con = sqlite3.connect(path)
        try:
            with con:
                con.execute(
                    "CREATE TABLE m (a, b, c, d, e)"
                )  # no declared types: pure dynamic columns
                con.executemany(
                    "INSERT INTO m VALUES (?, ?, ?, ?, ?)",
                    [
                        (1, 1, 1.5, b"\x01", None),
                        ("two", 2, 2, b"\x02", None),
                        (3.5, 3, None, "txt", None),
                        (None, 4, 4.0, None, None),
                    ],
                )
        finally:
            con.close()
        df = read_sqlite(spark, path, table="m")
        types = {f.name: f.dataType.simpleString() for f in df.schema.fields}
        assert types == {
            "a": "string",   # int+text+real mix -> string
            "b": "bigint",   # all-integer
            "c": "double",   # integer/real mix -> double
            "d": "string",   # blob+text mix -> string (blobs decoded)
            "e": "string",   # all NULL -> string
        }
        rows = sorted(map(tuple, df.collect()), key=lambda r: str(r[0]))
        assert ("1", 1, 1.5, "\x01", None) in rows
        assert ("two", 2, 2.0, "\x02", None) in rows
        assert ("3.5", 3, None, "txt", None) in rows
        assert (None, 4, 4.0, None, None) in rows

    def test_sqlite_url_parsing(self):
        from web_scrapper_spark.sources import sqlite_path_from_url

        assert sqlite_path_from_url("sqlite:///rel/x.db") == "rel/x.db"
        assert sqlite_path_from_url("sqlite:////abs/x.db") == "/abs/x.db"
        assert sqlite_path_from_url("jdbc:sqlite:/a/b.db") == "/a/b.db"
        assert sqlite_path_from_url("plain.sqlite3") == "plain.sqlite3"
        assert sqlite_path_from_url("postgresql://h/db") is None
        assert sqlite_path_from_url("/data/out.parquet") is None

    def test_jdbc_capability_probe_and_errors(self, spark):
        # the probe resolves real classpath classes and rejects absent
        # drivers; the explicit jdbc entry points fail fast with a
        # clear message instead of an opaque py4j stack
        import pytest

        from web_scrapper_spark.sources import (
            jdbc_driver_available, read_jdbc, write_jdbc,
        )

        assert jdbc_driver_available(spark, "org.not.a.Driver") is None
        # any JVM class proves the probe mechanism works end-to-end
        assert (
            jdbc_driver_available(spark, "java.lang.String") == "java.lang.String"
        )
        with pytest.raises(RuntimeError, match="no JDBC driver"):
            read_jdbc(spark, "jdbc:postgresql://h/d", "items")
        df = spark.createDataFrame([(1,)], "id long")
        with pytest.raises(RuntimeError, match="no JDBC driver"):
            write_jdbc(df, "jdbc:postgresql://h/d", "items")

    def test_live_jdbc_roundtrip_embedded_derby(self, spark, tmp_path):
        # S10's LIVE JDBC leg (round-4: closes the last S10 asterisk):
        # pyspark ships Apache Derby for the hive metastore, and
        # Derby's EMBEDDED driver needs no server — so the real
        # spark.read/write.jdbc path is provable in-sandbox:
        # distributed batch-insert write, typed read-back with NULLs,
        # dbtable-subquery pushdown, append mode. Derby is NOT in
        # DEFAULT_JDBC_DRIVERS (a 'db'-format postgres URL must keep
        # its loud parquet fallback), so the driver is explicit.
        import pytest

        from web_scrapper_spark.sources import (
            jdbc_driver_available, read_jdbc, write_jdbc,
        )

        drv = "org.apache.derby.jdbc.EmbeddedDriver"
        if jdbc_driver_available(spark, drv) is None:
            pytest.skip("Derby jars absent from this Spark build")
        url = f"jdbc:derby:{tmp_path}/db;create=true"
        df = spark.createDataFrame(
            [(1, 1.5, "a"), (2, None, "b")],
            "id bigint, score double, v string",
        )
        write_jdbc(df, url, "items", mode="overwrite", driver=drv)
        back = read_jdbc(spark, url, "items", driver=drv)
        assert sorted(map(tuple, back.collect())) == [
            (1, 1.5, "a"), (2, None, "b"),
        ]
        # dbtable pushdown: the subquery runs IN the database (Spark's
        # JDBC writer quotes column names, so Derby needs the quoted
        # case-exact identifiers here)
        one = read_jdbc(
            spark, url,
            '(SELECT "id" FROM items WHERE "id" = 1) AS q',
            driver=drv,
        )
        assert [tuple(r) for r in one.collect()] == [(1,)]
        # append accumulates across JDBC batch inserts
        write_jdbc(df, url, "items", mode="append", driver=drv)
        assert read_jdbc(spark, url, "items", driver=drv).count() == 4

    def test_write_any_db_requires_table(self, spark):
        # driver on the classpath but no target table: a clear
        # ValueError, not a KeyError after the crawl already ran
        import pytest

        from web_scrapper_spark.sources import write_any

        df = spark.createDataFrame([(1,)], "id long")
        with pytest.raises(ValueError, match="table"):
            write_any(
                df, "jdbc:postgresql://h/d", "db", driver="java.lang.String"
            )

    def test_query_table(self, spark):
        from web_scrapper_spark.sources import query_table

        df = spark.range(100).selectExpr("id", "id % 7 as grp")
        out = query_table(
            df, columns=["id"], where="grp = 3", order_by="id DESC", limit=3, offset=2
        ).collect()
        ids = [r["id"] for r in out]
        expected = sorted([i for i in range(100) if i % 7 == 3], reverse=True)[2:5]
        assert ids == expected


class TestAnsiEdgeCases:
    """ANSI mode (Spark 4 default) turns division-by-zero into runtime
    errors; degenerate inputs must not crash the operators."""

    def test_zero_vectors_dont_crash_cosine(self, spark):
        import web_scrapper_spark.operators.dedup as dd
        import web_scrapper_spark.operators.similarity as sim

        emb = spark.createDataFrame(
            [(1, [0.0, 0.0], 0), (2, [1.0, 0.0], 0), (3, [1.0, 0.1], 0)],
            "vec_id int, embedding array<float>, label int",
        )
        pairs = dd.embedding_near_pairs(emb, threshold=0.5).collect()
        assert [(r.id_a, r.id_b) for r in pairs] == [(2, 3)]
        q = emb.selectExpr("vec_id as query_id", "embedding")
        assert sim.cosine_topk(q, emb, k=2).count() == 6

    def test_empty_docs_dont_crash_minhash(self, spark):
        import web_scrapper_spark.operators.dedup as dd

        docs = spark.createDataFrame(
            [(1, ""), (2, ""), (3, "alpha beta gamma"), (4, "alpha beta gamma")],
            "doc_id int, text string",
        )
        pairs = dd.minhash_lsh_pairs(
            docs, num_hashes=4, band_size=1, jaccard_threshold=0.5
        ).collect()
        assert {(r.id_a, r.id_b) for r in pairs} >= {(3, 4)}


class TestExcelIO:
    """S8/S9: stdlib xlsx sink/source (sources/excel.py)."""

    def test_roundtrip_types_and_escaping(self, spark, tmp_path):
        from web_scrapper_spark.sources.excel import read_xlsx, write_xlsx

        df = spark.createDataFrame(
            [("alpha", 1.5, True, None), ("beta & <co>", 2.0, False, "x"),
             ("gamma", None, True, "y")],
            "name string, score double, flag boolean, note string",
        )
        path = str(tmp_path / "t.xlsx")
        write_xlsx(df, path)
        back = read_xlsx(spark, path)
        assert back.schema.simpleString() == df.schema.simpleString()
        assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))

    def test_multi_sheet_and_dispatch(self, spark, tmp_path):
        from web_scrapper_spark.sources.excel import (
            list_sheets, read_xlsx, write_xlsx_sheets,
        )
        from web_scrapper_spark.sources import read_any, write_any

        df = spark.createDataFrame([("a", 1.0), ("b", 2.0)], "k string, v double")
        multi = str(tmp_path / "m.xlsx")
        write_xlsx_sheets({"s1": df.select("k"), "s2": df}, multi)
        assert list_sheets(multi) == ["s1", "s2"]
        assert read_xlsx(spark, multi, sheet_name="s2").columns == ["k", "v"]
        etl = str(tmp_path / "e.xlsx")
        write_any(df, etl, "excel")
        assert read_any(spark, etl, "xls").count() == 2

    def test_sheet_name_with_quote_roundtrips(self, spark, tmp_path):
        # '"' in a sheet name lands in an XML attribute — must be
        # escaped as &quot; or workbook.xml is malformed
        from web_scrapper_spark.sources.excel import (
            list_sheets, read_xlsx, write_xlsx_sheets,
        )

        df = spark.createDataFrame([("a", 1.0)], "k string, v double")
        path = str(tmp_path / "q.xlsx")
        name = 'say "hi" <&>'
        write_xlsx_sheets({name: df}, path)
        assert list_sheets(path) == [name]
        assert read_xlsx(spark, path, sheet_name=name).count() == 1


class TestGopherQuality:
    """operators/quality.py — Gopher (Rae et al. 2021) repetition and
    shape heuristics, hand-computed on tiny documents."""

    def _run(self, spark, rows):
        from web_scrapper_spark.operators.quality import gopher_quality

        df = spark.createDataFrame(rows, "doc_id int, text string")
        return {r["doc_id"]: r.asDict() for r in gopher_quality(df).collect()}

    def test_duplicate_lines(self, spark):
        out = self._run(
            spark,
            [(1, "the cat sat on the mat\nthe cat sat on the mat\nunique line here")],
        )[1]
        # 3 lines, 1 is a repeat -> 1/3; 22 of 60 line chars are repeats
        assert out["line_count"] == 3
        assert out["dup_line_ppm"] == 333333
        assert out["dup_line_char_ppm"] == 366667  # 22/60

    def test_modal_ngram_char_fraction(self, spark):
        out = self._run(
            spark,
            [(1, "the cat sat on the mat\nthe cat sat on the mat\nunique line here")],
        )[1]
        # modal bigram at count 2, tie broken by longest then smallest
        # gram -> 'cat sat' (6 chars): 2*6 of 48 token chars
        assert out["top2_char_ppm"] == 250000

    def test_overlapping_repeat_exceeds_one(self, spark):
        # 'spam' x6: modal bigram 'spam spam' occurs 5x overlapping ->
        # fraction 5*8/24 > 1, matching Gopher's overlap-counting
        out = self._run(spark, [(1, "spam spam spam spam spam spam")])[1]
        assert out["top2_char_ppm"] == 1666667
        assert not out["gopher_keep"]

    def test_dup5_counts_occurrences_beyond_first(self, spark):
        # 7 tokens 'a b c d e a b': single 5-gram each -> no dup
        out = self._run(spark, [(1, "a b c d e a b")])[1]
        assert out["dup5_char_ppm"] == 0
        # 'a b c d e a b c d e' -> 5-gram 'a b c d e' twice (positions
        # 1 and 6): dup chars = (2-1)*5 of 10
        out2 = self._run(spark, [(1, "a b c d e a b c d e")])[1]
        assert out2["dup5_char_ppm"] == 500000

    def test_shape_heuristics(self, spark):
        out = self._run(spark, [(1, "• one\n• two\n• three\nend...")])[1]
        assert out["bullet_line_ppm"] == 750000
        assert out["ellipsis_line_ppm"] == 250000
        assert out["symbol_word_ppm"] == 250000  # one '...' / 4 words

    def test_empty_and_keep(self, spark):
        rows = [
            (1, ""),
            (
                2,
                " ".join(
                    f"alpha{i} beta{i} gamma{i} delta{i} epsilon{i}"
                    for i in range(20)
                ),
            ),
        ]
        out = self._run(spark, rows)
        assert out[1]["word_count"] == 0 and not out[1]["gopher_keep"]
        # 100 distinct-ish words, mean len in range, no repetition
        assert out[2]["gopher_keep"]

    def test_thresholds_reject_repetitive(self, spark):
        # a 60-word doc that is one sentence repeated 10x: dup lines 0
        # (single line) but modal 3-gram fraction is huge
        text = "tokens repeat endlessly in this document " * 10
        out = self._run(spark, [(1, text.strip())])[1]
        assert out["word_count"] == 60
        assert out["top3_char_ppm"] > 180000
        assert not out["gopher_keep"]


class TestC4Clean:
    """operators/quality.py c4_clean — C4 (Raffel et al. 2020 §2.2)
    line and page heuristics."""

    def _run(self, spark, rows):
        from web_scrapper_spark.operators.quality import c4_clean

        df = spark.createDataFrame(rows, "doc_id int, text string")
        return {r["doc_id"]: r.asDict() for r in c4_clean(df).collect()}

    def test_line_rules_and_precedence(self, spark):
        text = "\n".join(
            [
                "Too short",                               # <3 words
                "no terminal punctuation on this line",    # >=3 words, no punct
                "Enable javascript to continue reading.",  # terminal but js
                "This line survives the filter.",          # kept
                "So does this second sentence!",           # kept
            ]
        )
        out = self._run(spark, [(1, text)])[1]
        assert out["line_count"] == 5
        assert out["short_dropped"] == 1
        assert out["nopunct_dropped"] == 1
        assert out["js_dropped"] == 1
        assert out["kept_line_count"] == 2
        assert out["sentence_count"] == 2

    def test_page_gates(self, spark):
        good = "\n".join(
            f"Sentence number {i} is here and properly done." for i in range(6)
        )
        out = self._run(
            spark,
            [
                (1, good),
                (2, good + "\nsome lorem ipsum filler text."),
                (3, good + "\nfunction f() { return 1; }"),
                (4, "Only two sentences exist here.\nAnd this is the second."),
            ],
        )
        assert out[1]["c4_keep"]
        assert out[2]["has_lorem"] and not out[2]["c4_keep"]
        assert out[3]["has_brace"] and not out[3]["c4_keep"]
        assert out[4]["sentence_count"] == 2 and not out[4]["c4_keep"]

    def test_cleaned_md5_matches_joined_kept_lines(self, spark):
        import hashlib

        text = "Drop me\nKeep this first line.\nKeep this second line."
        out = self._run(spark, [(1, text)])[1]
        expect = hashlib.md5(
            "Keep this first line.\nKeep this second line.".encode()
        ).hexdigest()
        assert out["cleaned_md5"] == expect

    def test_empty_doc(self, spark):
        out = self._run(spark, [(1, "")])[1]
        import hashlib

        assert out["kept_line_count"] == 0
        assert out["cleaned_md5"] == hashlib.md5(b"").hexdigest()
        assert not out["c4_keep"]


class TestParagraphDedup:
    """operators/dedup.py paragraph_dedup — CCNet cross-corpus
    boilerplate paragraph removal."""

    def test_first_occurrence_wins_across_docs(self, spark):
        boiler = "All rights reserved by the site."
        df = spark.createDataFrame(
            [
                (2, f"unique alpha text.\n{boiler}"),
                (1, f"unique beta text.\n{boiler}"),
                (3, boiler),
            ],
            "doc_id int, text string",
        )
        rows = dd.paragraph_dedup(df).collect()
        by = {(r["doc_id"], r["para_idx"]): r for r in rows}
        # boiler: 3 occurrences, keeper is (1,1) — smallest (doc, idx)
        assert by[(1, 1)]["keep"] and by[(1, 1)]["dup_count"] == 3
        assert not by[(2, 1)]["keep"] and not by[(3, 0)]["keep"]
        # unique paras keep with dup_count 1
        assert by[(1, 0)]["keep"] and by[(1, 0)]["dup_count"] == 1

    def test_normalization_and_positions(self, spark):
        df = spark.createDataFrame(
            [(1, "Same   Para  here\n\n  same para HERE  \nother line")],
            "doc_id int, text string",
        )
        rows = {r["para_idx"]: r for r in dd.paragraph_dedup(df).collect()}
        # whitespace/case-normalized hash makes idx 0 and idx 2 dups;
        # the empty line keeps its slot in para_idx numbering
        assert rows[0]["para_md5"] == rows[2]["para_md5"]
        assert rows[0]["keep"] and not rows[2]["keep"]
        assert rows[0]["n_words"] == 3
        assert set(rows) == {0, 2, 3}


class TestConnectedComponents:
    def _expected(self, edges):
        parent = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        return {n: find(n) for n in parent}

    def _run(self, spark, edges):
        df = spark.createDataFrame(edges, "id_a long, id_b long")
        got = {
            r["node"]: r["component"]
            for r in dd.connected_components(df).collect()
        }
        assert got == self._expected(edges)

    def test_chain_worst_case_diameter(self, spark):
        # a path graph exercises the O(log n) round bound — min-label
        # propagation would need n rounds here, alternating stars ~log n
        self._run(spark, [(i, i + 1) for i in range(40)])

    def test_random_graph_matches_union_find(self, spark):
        import random

        rnd = random.Random(7)
        edges = [
            (rnd.randrange(60), rnd.randrange(60)) for _ in range(80)
        ]
        edges = [(a, b) for a, b in edges if a != b]
        self._run(spark, edges)

    def test_two_cliques_and_reversed_edges(self, spark):
        edges = [(a, b) for a in range(5) for b in range(5) if a < b]
        edges += [(b, a) for a in range(10, 14) for b in range(a + 1, 14)]
        self._run(spark, edges)

    def test_dedup_components_canonical_per_cluster(self, spark):
        docs = spark.createDataFrame(
            [(i, f"doc {i}") for i in range(8)], "doc_id long, text string"
        )
        pairs = spark.createDataFrame(
            [(1, 3), (3, 5), (6, 7)], "id_a long, id_b long"
        )
        rows = {r["doc_id"]: r for r in dd.dedup_components(docs, pairs).collect()}
        assert len(rows) == 8
        assert rows[5]["component"] == 1 and not rows[5]["is_canonical"]
        assert rows[3]["component"] == 1 and not rows[3]["is_canonical"]
        assert rows[1]["is_canonical"]
        assert rows[7]["component"] == 6 and not rows[7]["is_canonical"]
        # singletons are their own canonical component
        for i in (0, 2, 4):
            assert rows[i]["component"] == i and rows[i]["is_canonical"]


class TestDecontaminate:
    def test_flags_docs_sharing_benchmark_ngrams(self, spark):
        from web_scrapper_spark.operators.quality import decontaminate

        bench = spark.createDataFrame(
            [(100, "the quick brown fox jumps over the lazy dog")],
            "doc_id long, text string",
        )
        docs = spark.createDataFrame(
            [
                # contains the benchmark 5-gram "quick brown fox jumps over"
                (0, "a quick brown fox jumps over a fence"),
                # shares only 4-grams, not 5 — clean at n=5
                (1, "quick brown fox jumps somewhere else entirely"),
                (2, "no overlap at all here in this text"),
                # two distinct contaminated 5-grams
                (3, "the quick brown fox jumps over the lazy dog again"),
            ],
            "doc_id long, text string",
        )
        rows = {
            r["doc_id"]: r
            for r in decontaminate(docs, bench, n=5).collect()
        }
        assert not rows[0]["contam_keep"] and rows[0]["contaminated_ngrams"] == 1
        assert rows[1]["contam_keep"]
        assert rows[2]["contam_keep"]
        assert not rows[3]["contam_keep"] and rows[3]["contaminated_ngrams"] >= 5

    def test_short_docs_and_empty_benchmark(self, spark):
        from web_scrapper_spark.operators.quality import decontaminate

        bench = spark.createDataFrame([], "doc_id long, text string")
        docs = spark.createDataFrame(
            [(0, "too short"), (1, "")], "doc_id long, text string"
        )
        rows = decontaminate(docs, bench, n=5).collect()
        assert all(r["contam_keep"] and r["contaminated_ngrams"] == 0 for r in rows)


class TestDsirWeights:
    def test_target_like_docs_score_higher(self, spark):
        from web_scrapper_spark.operators.quality import dsir_weights

        target = spark.createDataFrame(
            [(100 + i, "quantum physics lecture notes on entanglement")
             for i in range(4)],
            "doc_id long, text string",
        )
        docs = spark.createDataFrame(
            [
                (0, "quantum physics lecture notes on entanglement"),
                (1, "cheap shoes buy now discount sale free shipping"),
                (2, "physics lecture about quantum theory"),
            ],
            "doc_id long, text string",
        )
        rows = {
            r["doc_id"]: r
            for r in dsir_weights(docs, target, n=2, buckets=64).collect()
        }
        # exact target replica beats the spam doc, and the verdicts split
        assert rows[0]["score_ppm"] > rows[1]["score_ppm"]
        assert rows[2]["score_ppm"] > rows[1]["score_ppm"]
        assert rows[0]["dsir_keep"] and not rows[1]["dsir_keep"]

    def test_empty_and_short_docs(self, spark):
        from web_scrapper_spark.operators.quality import dsir_weights

        target = spark.createDataFrame(
            [(9, "alpha beta gamma delta")], "doc_id long, text string"
        )
        docs = spark.createDataFrame(
            [(0, ""), (1, "single")], "doc_id long, text string"
        )
        rows = {r["doc_id"]: r for r in dsir_weights(docs, target).collect()}
        for i in (0, 1):
            assert rows[i]["gram_count"] == 0
            assert rows[i]["score_ppm"] == 0
            assert not rows[i]["dsir_keep"]


class TestCcnetPpl:
    def test_matches_python_lm(self, spark):
        """Exact-match the hashed bigram LM against a plain-python
        recomputation (hashlib md5 buckets, math.log)."""
        import hashlib
        import math

        from web_scrapper_spark.operators.quality import ccnet_ppl_buckets

        ref_texts = [
            "the quick brown fox jumps over the lazy dog",
            "the quick brown cat sleeps under the warm sun",
            "a quick brown fox runs through the green field",
        ]
        doc_texts = [
            (0, "the quick brown fox jumps over the lazy dog"),  # in-domain
            (1, "zebra xylophone quartz vortex jackal numb"),    # OOV-ish
            (2, ""),                                             # short
            (3, "single"),                                       # 1 token
        ]
        B2, B1 = 256, 64
        ref = spark.createDataFrame(
            [(100 + i, t) for i, t in enumerate(ref_texts)],
            "doc_id long, text string",
        )
        docs = spark.createDataFrame(doc_texts, "doc_id long, text string")
        out = {
            r["doc_id"]: r
            for r in ccnet_ppl_buckets(
                docs, ref, bigram_buckets=B2, context_buckets=B1,
                head_ppm=3_000_000, tail_ppm=5_000_000,
            ).collect()
        }

        def bucket(s, B):
            return int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % B

        import re

        def toks(t):
            return [w for w in re.split(r"[^a-z0-9_]+", t.lower()) if w]

        bc, cc = {}, {}
        for t in ref_texts:
            ws = toks(t)
            for a, b in zip(ws, ws[1:]):
                bc[bucket(f"{a} {b}", B2)] = bc.get(bucket(f"{a} {b}", B2), 0) + 1
            for w in ws:
                cc[bucket(w, B1)] = cc.get(bucket(w, B1), 0) + 1
        for did, t in doc_texts:
            ws = toks(t)
            bis = list(zip(ws, ws[1:]))
            got = out[did]
            assert got["bigram_count"] == len(bis)
            if not bis:
                assert got["nll_ppm"] is None
                assert got["ppl_bucket"] == "short"
                continue
            nll = sum(
                math.log(cc.get(bucket(a, B1), 0) + float(B2))
                - math.log(bc.get(bucket(f"{a} {b}", B2), 0) + 1.0)
                for a, b in bis
            ) / len(bis)
            assert got["nll_ppm"] == round(nll * 1_000_000)
        # the in-domain doc must look far more reference-like
        assert out[0]["nll_ppm"] < out[1]["nll_ppm"]
        assert out[0]["ppl_bucket"] in ("head", "middle")
        assert out[1]["ppl_bucket"] == "tail"

    def test_bad_cutoffs(self, spark):
        from web_scrapper_spark.operators.quality import ccnet_ppl_buckets

        docs = spark.createDataFrame([(0, "a b")], "doc_id long, text string")
        with pytest.raises(ValueError):
            ccnet_ppl_buckets(docs, docs, head_ppm=5, tail_ppm=4)


class TestExactSubstring:
    """exact_substring_dedup — Lee et al. duplicate-span removal."""

    K, B = 10, 5

    def _run(self, spark, rows):
        df = spark.createDataFrame(rows, "doc_id long, text string")
        return {
            r["doc_id"]: r
            for r in dd.exact_substring_dedup(df, k=self.K, block=self.B).collect()
        }

    def test_cross_doc_span_removed_from_both(self, spark):
        span = " ".join(f"tok{i}" for i in range(12))  # 12 > k=10
        a = "alpha beta " + span + " gamma delta"
        b = "one two three " + span + " four"
        c = "no duplicated content here at all just unique words everywhere now"
        out = self._run(spark, [(1, a), (2, b), (3, c)])
        # the shared 12-token run yields 3 duplicated windows merging to
        # one span of 12 tokens in each doc
        for d, ntok in ((1, 16), (2, 16)):
            assert out[d]["n_spans"] == 1
            assert out[d]["n_removed"] == 12
            assert out[d]["n_tokens"] == ntok
        assert out[1]["kept_text"] == "alpha beta gamma delta"
        assert out[2]["kept_text"] == "one two three four"
        assert out[3]["n_removed"] == 0
        assert out[3]["kept_text"] == c

    def test_within_doc_repetition(self, spark):
        run = " ".join(f"w{i}" for i in range(10))
        text = run + " middle words here " + run
        out = self._run(spark, [(1, text)])
        # both copies of the 10-token run are duplicated windows
        assert out[1]["n_spans"] == 2
        assert out[1]["n_removed"] == 20
        assert out[1]["kept_text"] == "middle words here"

    def test_identical_docs_fully_removed(self, spark):
        t = " ".join(f"x{i}" for i in range(15))
        out = self._run(spark, [(1, t), (2, t)])
        for d in (1, 2):
            assert out[d]["n_removed"] == 15
            assert out[d]["kept_text"] == ""
        # md5("") must match Spark's empty-join convention
        import hashlib

        assert out[1]["kept_md5"] == hashlib.md5(b"").hexdigest()

    def test_short_docs_pass_through(self, spark):
        out = self._run(spark, [(1, "tiny doc"), (2, "tiny doc")])
        assert out[1]["n_spans"] == 0
        assert out[1]["kept_text"] == "tiny doc"

    def test_adjacent_spans_merge(self, spark):
        # two dup runs placed back-to-back in one doc merge into one span
        r1 = " ".join(f"a{i}" for i in range(10))
        r2 = " ".join(f"b{i}" for i in range(10))
        host = r1 + " " + r2
        out = self._run(spark, [(1, host), (2, r1), (3, r2)])
        assert out[1]["n_spans"] == 1
        assert out[1]["n_removed"] == 20

    def test_k_block_validation(self, spark):
        df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
        with pytest.raises(ValueError):
            dd.exact_substring_dedup(df, k=10, block=3)

    def test_bruteforce_parity_sf0001(self, spark, docs):
        import hashlib
        import re
        from collections import Counter

        k = 20
        rows = {r["doc_id"]: r["text"] for r in docs.collect()}

        def toks(t):
            return [w for w in re.split(r"[^a-z0-9_]+", t.lower()) if w]

        cnt = Counter()
        tokmap = {}
        for d, t in rows.items():
            tt = toks(t)
            tokmap[d] = tt
            for i in range(len(tt) - k + 1):
                cnt[tuple(tt[i : i + k])] += 1
        got = {
            r["doc_id"]: (r["n_tokens"], r["n_spans"], r["n_removed"], r["kept_md5"])
            for r in dd.exact_substring_dedup(docs, k=k, block=10).collect()
        }
        n_hit = 0
        for d, tt in tokmap.items():
            hits = [i for i in range(len(tt) - k + 1) if cnt[tuple(tt[i : i + k])] >= 2]
            spans = []
            for p in sorted(hits):
                if spans and p <= spans[-1][1]:
                    spans[-1][1] = p + k
                else:
                    spans.append([p, p + k])
            keep = [
                w for i, w in enumerate(tt) if not any(s <= i < e for s, e in spans)
            ]
            exp = (
                len(tt),
                len(spans),
                sum(e - s for s, e in spans),
                hashlib.md5(" ".join(keep).encode()).hexdigest(),
            )
            n_hit += bool(spans)
            assert got[d] == exp, f"doc {d}"
        assert n_hit > 0  # fixture genuinely exercises the operator


class TestPagerank:
    """operators/graph.py — fixed-point integer PageRank."""

    def _sim(self, edges, iters=10, d=85):
        from collections import defaultdict

        from web_scrapper_spark.operators.graph import PAGERANK_SCALE as S

        nodes = sorted({u for e in edges for u in e})
        deg = defaultdict(int)
        for s, _ in edges:
            deg[s] += 1
        r0 = S // len(nodes)
        base = ((100 - d) * r0) // 100
        r = {v: r0 for v in nodes}
        for _ in range(iters):
            c = defaultdict(int)
            for s, t in edges:
                c[t] += r[s] // deg[s]
            r = {v: base + (c[v] * d) // 100 for v in nodes}
        return r

    def test_matches_integer_simulation(self, spark):
        from web_scrapper_spark.operators.graph import pagerank

        E = [(1, 2), (1, 3), (2, 3), (3, 1), (4, 3), (5, 3), (5, 1)]
        df = spark.createDataFrame(E, "src long, dst long")
        got = {r["node"]: r["rank"] for r in pagerank(df, num_iters=10).collect()}
        assert got == self._sim(E)

    def test_ordering_is_sane(self, spark):
        # a star graph: the hub must outrank every leaf
        from web_scrapper_spark.operators.graph import pagerank

        # 0↔1 form a cycle, so the 0/1 ranks oscillate with decay
        # 0.85² per round trip — 30 iterations is well converged
        E = [(leaf, 0) for leaf in range(1, 8)] + [(0, 1)]
        df = spark.createDataFrame(E, "src long, dst long")
        got = {r["node"]: r["rank"] for r in pagerank(df, num_iters=30).collect()}
        assert got[0] == max(got.values())
        assert got[0] > got[2]

    def test_dangling_node_keeps_base_rank(self, spark):
        from web_scrapper_spark.operators.graph import PAGERANK_SCALE, pagerank

        E = [(1, 2), (2, 3)]  # 3 is dangling
        df = spark.createDataFrame(E, "src long, dst long")
        got = {r["node"]: r["rank"] for r in pagerank(df, num_iters=4).collect()}
        assert got == self._sim(E, iters=4)
        assert set(got) == {1, 2, 3}
        # node 1 has no in-links: exactly the teleport base
        base = ((100 - 85) * (PAGERANK_SCALE // 3)) // 100
        assert got[1] == base

    def test_determinism_across_partitionings(self, spark):
        from web_scrapper_spark.operators.graph import pagerank

        E = [(i, (i * 7 + 3) % 40) for i in range(40)] + [
            (i, (i * 11 + 1) % 40) for i in range(40)
        ]
        df1 = spark.createDataFrame(E, "src long, dst long").repartition(1)
        df2 = spark.createDataFrame(E, "src long, dst long").repartition(16)
        r1 = {r["node"]: r["rank"] for r in pagerank(df1, num_iters=6).collect()}
        r2 = {r["node"]: r["rank"] for r in pagerank(df2, num_iters=6).collect()}
        assert r1 == r2

    def test_host_edges_aggregates_by_host(self, spark):
        from web_scrapper_spark.operators.graph import host_edges

        links = spark.createDataFrame(
            [
                ("https://a.com/p1", "https://b.com/x"),
                ("https://a.com/p2", "https://b.com/y"),
                ("https://a.com/p3", "https://a.com/p1"),
                (None, "https://b.com/z"),
                # malformed URL (space): ANSI parse_url would THROW —
                # try_parse_url nulls it and the filter drops the row
                ("https://a.com/p4", "http inval id"),
            ],
            "src_url string, url string",
        )
        got = {(r["src"], r["dst"]): r["weight"] for r in host_edges(links).collect()}
        assert got == {("a.com", "b.com"): 2, ("a.com", "a.com"): 1}


class TestRedirectResolve:
    """operators/graph.py — pointer-doubling redirect/canonical chains."""

    def _resolve(self, spark, edges, max_hops=32):
        from web_scrapper_spark.operators.graph import resolve_redirects

        df = spark.createDataFrame(edges, "url string, target string")
        return {
            r["url"]: (r["final_url"], r["hops"], r["resolved"])
            for r in resolve_redirects(df, max_hops=max_hops).collect()
        }

    def test_chain_resolves_with_exact_hops(self, spark):
        got = self._resolve(spark, [("a", "b"), ("b", "c"), ("c", "d")])
        assert got == {
            "a": ("d", 3, True),
            "b": ("d", 2, True),
            "c": ("d", 1, True),
        }

    def test_cycle_and_feeder_are_unresolved(self, spark):
        # x→y→z→x cycle; f feeds into it; t resolves elsewhere
        got = self._resolve(
            spark,
            [("x", "y"), ("y", "z"), ("z", "x"), ("f", "x"), ("t", "done")],
        )
        assert got["t"] == ("done", 1, True)
        for u in ("x", "y", "z", "f"):
            assert got[u] == (None, None, False)

    def test_self_loop_unresolved(self, spark):
        got = self._resolve(spark, [("s", "s"), ("a", "s")])
        assert got["s"] == (None, None, False)
        assert got["a"] == (None, None, False)

    def test_max_hops_boundary(self, spark):
        # chain of exactly max_hops resolves; one longer does not
        chain = [(f"n{i}", f"n{i + 1}") for i in range(4)]  # n0→…→n4, 4 hops
        got = self._resolve(spark, chain, max_hops=4)
        assert got["n0"] == ("n4", 4, True)
        got3 = self._resolve(spark, chain, max_hops=3)
        assert got3["n0"] == (None, None, False)
        assert got3["n1"] == ("n4", 3, True)

    def test_duplicate_pointers_collapse_deterministically(self, spark):
        got = self._resolve(spark, [("a", "c"), ("a", "b")])
        assert got["a"] == ("b", 1, True)  # lexicographic-min target


class TestCanonicalEdges:
    def test_both_attribute_orders_and_self_drop(self, spark):
        from web_scrapper_spark.operators.graph import canonical_edges

        pages = spark.createDataFrame(
            [
                ("u1", '<head><link rel="canonical" href="https://c/1"></head>'),
                ("u2", "<link href='https://c/2' rel='canonical'>"),
                ("u3", '<link rel="canonical" href="u3">'),  # self → dropped
                ("u4", "<p>no tag</p>"),
            ],
            "url string, html string",
        )
        got = {r["url"]: r["target"] for r in canonical_edges(pages).collect()}
        assert got == {"u1": "https://c/1", "u2": "https://c/2"}


class TestMainContent:
    """operators/quality.py — jusText-shallow boilerplate removal."""

    def _run(self, spark, html):
        from web_scrapper_spark.operators.quality import main_content

        df = spark.createDataFrame([(1, html)], "doc_id long, html string")
        return main_content(df).collect()[0]

    def test_nav_footer_dropped_prose_kept(self, spark):
        prose = "This paragraph is long enough to be kept as body prose."
        html = (
            '<html><body><div id="nav"><a href="/">Home page link</a> '
            '<a href="/b">Blog archive pages</a></div>'
            f"<p>{prose}</p>"
            '<footer><a href="/c">Contact us right now</a></footer>'
            "</body></html>"
        )
        r = self._run(spark, html)
        assert r["kept_blocks"] == 1
        # nav (33 anchor chars, >= min_chars) is linky; the footer's
        # "Contact us right now" is 20 chars — below min_chars, so it
        # lands in the disjoint dropped_short counter
        assert r["dropped_linky"] == 1
        assert r["dropped_short"] == 1
        assert r["content_len"] == len(prose)

    def test_short_blocks_dropped(self, spark):
        r = self._run(spark, "<p>tiny</p><p>also very small</p>")
        assert r["kept_blocks"] == 0
        assert r["dropped_short"] == 2
        assert r["n_blocks"] == 2

    def test_mixed_anchor_density_boundary(self, spark):
        # tag-stripping inserts a space between anchor and tail text,
        # so 21 anchor chars + space + 20 tail chars = 42 chars with
        # exactly half from the anchor → 500000 ppm → kept at the
        # default threshold (<=); one more anchor char → dropped
        tail = "x" * 20
        kept_html = f"<p><a href='/'>{'x' * 21}</a>{tail}</p>"
        r = self._run(spark, kept_html)
        assert (r["kept_blocks"], r["dropped_linky"]) == (1, 0)
        assert r["content_len"] == 42
        over_html = f"<p><a href='/'>{'x' * 22}</a>{tail}</p>"
        r2 = self._run(spark, over_html)
        assert (r2["kept_blocks"], r2["dropped_linky"]) == (0, 1)

    def test_inline_tags_stay_in_block(self, spark):
        html = (
            "<p>Some <b>bold</b> and <em>emphasised</em> words make "
            "one single block of text.</p>"
        )
        r = self._run(spark, html)
        assert r["n_blocks"] == 1
        assert r["kept_blocks"] == 1


class TestMinhashIncremental:
    """operators/dedup.py — delta-vs-index incremental LSH."""

    DOCS = [
        (0, "the quick brown fox jumps over the lazy dog tonight"),
        (1, "the quick brown fox jumps over the lazy dog today"),
        (2, "a completely different document about spark shuffles"),
        (3, "the quick brown fox jumps over the lazy dog tonight"),
        (4, "another unrelated text on parquet predicate pushdown"),
        (5, "a completely different document about spark shuffles"),
    ]

    def _pairs(self, df):
        return {
            (r["id_a"], r["id_b"]) for r in df.select("id_a", "id_b").collect()
        }

    def test_incremental_equals_batch_restriction(self, spark):
        from web_scrapper_spark.operators import dedup as dd

        docs = spark.createDataFrame(self.DOCS, "doc_id long, text string")
        kw = dict(num_hashes=4, band_size=1, shingle_n=3,
                  jaccard_threshold=0.5)
        batch = self._pairs(dd.minhash_lsh_pairs(docs, **kw))
        new = docs.filter("doc_id % 2 = 0")
        old = docs.filter("doc_id % 2 = 1")
        ish = dd.shingled_docs(old, shingle_n=3)
        ib = dd.minhash_bands(old, num_hashes=4, band_size=1,
                              shingle_n=3, shingled=ish)
        pairs, dbands, dsh = dd.minhash_lsh_incremental(new, ib, ish, **kw)
        want = {p for p in batch if p[0] % 2 == 0 or p[1] % 2 == 0}
        assert self._pairs(pairs) == want
        assert want  # fixture actually produces cross + intra pairs
        kinds = {(r["id_a"], r["id_b"]): r["pair_kind"] for r in pairs.collect()}
        for (a, b), k in kinds.items():
            expect = "delta_delta" if a % 2 == 0 and b % 2 == 0 else "delta_index"
            assert k == expect
        # index maintenance outputs are exactly the delta's bands/shingles
        assert dbands.count() == new.count() * 4
        assert dsh.count() == new.count()


class TestAnchorTextProfile:
    def test_profile_rank_and_stopwords(self, spark):
        from web_scrapper_spark.operators.graph import anchor_text_profile

        edges = spark.createDataFrame(
            [
                ("t1", "the best spark engine"),
                ("t1", "spark engine docs"),
                ("t1", "spark tutorial"),
                ("t2", "click here"),  # 'here' is len 4.. kept unless stopword
            ],
            "target string, anchor string",
        )
        rows = anchor_text_profile(edges, k=2).collect()
        t1 = [(r["word"], r["freq"], r["rank"]) for r in rows if r["target"] == "t1"]
        assert t1 == [("spark", 3, 1), ("engine", 2, 2)]
        # stop words ('the') never appear
        assert all(r["word"] != "the" for r in rows)

    def test_k_bounds_output(self, spark):
        from web_scrapper_spark.operators.graph import anchor_text_profile

        edges = spark.createDataFrame(
            [("t", "alpha beta gamma delta epsilon")],
            "target string, anchor string",
        )
        assert anchor_text_profile(edges, k=3).count() == 3


class TestInlinkStats:
    def test_counts(self, spark):
        from web_scrapper_spark.operators.graph import inlink_stats

        edges = spark.createDataFrame(
            [
                ("https://a.org/1", "t1"),
                ("https://a.org/1", "t1"),  # same page twice
                ("https://a.org/2", "t1"),
                ("https://b.org/x", "t1"),
                ("https://b.org/y", "t2"),
            ],
            "src string, target string",
        )
        got = {r["target"]: r for r in inlink_stats(edges).collect()}
        assert got["t1"]["n_inlinks"] == 4
        assert got["t1"]["n_src_pages"] == 3
        assert got["t1"]["n_src_hosts"] == 2
        assert got["t2"]["n_inlinks"] == 1

    def test_approx_mode_runs(self, spark):
        from web_scrapper_spark.operators.graph import inlink_stats

        edges = spark.createDataFrame(
            [("https://a.org/1", "t1"), ("https://b.org/2", "t1")],
            "src string, target string",
        )
        got = inlink_stats(edges, exact=False).collect()[0]
        assert got["n_src_hosts"] == 2  # HLL exact at tiny cardinality


class TestUrlTrapSignals:
    def _run(self, spark, urls, **kw):
        from web_scrapper_spark.frontier.traps import url_trap_signals

        df = spark.createDataFrame([(u,) for u in urls], "url string")
        return {r["url"]: r for r in url_trap_signals(df, **kw).collect()}

    def test_loop_and_depth(self, spark):
        got = self._run(
            spark,
            [
                "https://h.org/cal/2024/01/2024/01/p",  # loop
                "https://h.org/a/b/c/d/e/f/g/h/i/j",  # depth 10
                "https://h.org/a/b",  # clean
            ],
        )
        assert got["https://h.org/cal/2024/01/2024/01/p"]["trap_reason"] == "loop"
        assert got["https://h.org/cal/2024/01/2024/01/p"]["dup_segments"] == 2
        deep = got["https://h.org/a/b/c/d/e/f/g/h/i/j"]
        assert (deep["trap_reason"], deep["depth"]) == ("depth", 10)
        assert got["https://h.org/a/b"]["trap_reason"] is None

    def test_query_explosion_threshold(self, spark):
        urls = [f"https://h.org/p?sid={i}" for i in range(5)] + [
            "https://h.org/q?a=1",
            "https://h.org/q?a=2",
        ]
        got = self._run(spark, urls, query_k=5)
        assert got["https://h.org/p?sid=0"]["trap_reason"] == "query_explosion"
        assert got["https://h.org/p?sid=0"]["path_queries"] == 5
        assert got["https://h.org/q?a=1"]["trap_reason"] is None
        assert got["https://h.org/q?a=1"]["path_queries"] == 2

    def test_queryless_paths_count_zero(self, spark):
        got = self._run(spark, ["https://h.org/x", "https://h.org/x"])
        assert got["https://h.org/x"]["path_queries"] == 0

    def test_approx_mode_agrees_when_separated(self, spark):
        urls = [f"https://h.org/p?s={i}" for i in range(40)] + [
            "https://h.org/q"
        ]
        exact = self._run(spark, urls, query_k=20)
        approx = self._run(spark, urls, query_k=20, exact=False)
        for u in ("https://h.org/p?s=0", "https://h.org/q"):
            assert exact[u]["trap_reason"] == approx[u]["trap_reason"]

    def test_malformed_url_not_dropped(self, spark):
        got = self._run(spark, ["not a url at all", "https://h.org/x"])
        assert got["not a url at all"]["trap_reason"] is None
        assert len(got) == 2


class TestBm25:
    DOCS = [
        (1, "spark engine shuffle shuffle partition"),
        (2, "spark catalyst optimizer"),
        (3, "engine shuffle plan"),
    ]

    def test_matches_python_fixed_point(self, spark):
        import math

        from web_scrapper_spark.operators.textops import bm25_term_weights

        docs = spark.createDataFrame(self.DOCS, "doc_id long, text string")
        got = {
            (r["doc_id"], r["word"]): r
            for r in bm25_term_weights(docs).collect()
        }
        # recompute in plain python: same tokens (none are stopwords,
        # all len>2), N=3, T=11
        corpus = {i: t.split() for i, t in self.DOCS}
        n = len(corpus)
        t_total = sum(len(v) for v in corpus.values())
        dfreq = {}
        for toks in corpus.values():
            for w in set(toks):
                dfreq[w] = dfreq.get(w, 0) + 1
        for (did, toks) in corpus.items():
            dl = len(toks)
            for w in set(toks):
                tf = toks.count(w)
                df = dfreq[w]
                idf_ppm = math.floor(
                    math.log((2.0 * (n + 1)) / (2 * df + 1)) * 1_000_000 + 0.5
                )
                score = (idf_ppm * 44 * tf * t_total) // (
                    20 * tf * t_total + 6 * t_total + 18 * dl * n
                )
                r = got[(did, w)]
                assert (r["tf"], r["df"], r["dl"]) == (tf, df, dl)
                assert r["score_u"] == score, (did, w)

    def test_topk_rank(self, spark):
        from web_scrapper_spark.operators.textops import bm25_term_weights

        docs = spark.createDataFrame(self.DOCS, "doc_id long, text string")
        out = bm25_term_weights(docs, k=1).collect()
        assert len(out) == 3  # one winner per doc
        assert all(r["rank"] == 1 for r in out)
        # doc 1's winner is its double 'shuffle' unless idf crushes it
        w1 = [r for r in out if r["doc_id"] == 1][0]
        assert w1["tf"] >= 1


class TestClusterRepresentatives:
    def _run(self, spark, docs_rows, pairs_rows, **kw):
        from web_scrapper_spark.operators.dedup import cluster_representatives

        docs = spark.createDataFrame(docs_rows, "doc_id long, n_chars long")
        pairs = spark.createDataFrame(pairs_rows, "id_a long, id_b long")
        return {
            r["doc_id"]: r
            for r in cluster_representatives(docs, pairs, **kw).collect()
        }

    def test_quality_picks_best(self, spark):
        got = self._run(
            spark,
            [(1, 10), (2, 99), (3, 50), (4, 7)],
            [(1, 2), (2, 3)],
            quality_col="n_chars",
        )
        assert [got[i]["keep"] for i in (1, 2, 3)] == [False, True, False]
        assert all(got[i]["component"] == 1 for i in (1, 2, 3))
        assert all(got[i]["cluster_size"] == 3 for i in (1, 2, 3))
        # singleton keeps itself
        assert (got[4]["keep"], got[4]["cluster_size"]) == (True, 1)

    def test_tie_breaks_to_min_id(self, spark):
        got = self._run(
            spark, [(5, 10), (6, 10)], [(5, 6)], quality_col="n_chars"
        )
        assert got[5]["keep"] and not got[6]["keep"]

    def test_default_min_id(self, spark):
        got = self._run(spark, [(7, 1), (8, 999)], [(7, 8)])
        assert got[7]["keep"] and not got[8]["keep"]


class TestHostPriors:
    def test_rollup_and_modal_lang(self, spark):
        from web_scrapper_spark.operators.quality import host_priors

        rows = [
            ("h1", True, "en"), ("h1", True, "en"), ("h1", False, "de"),
            ("h2", False, "fr"), ("h2", True, "es"),  # 1-1 tie -> es? no: es vs fr tie -> es < fr
            ("h3", False, "de"),
        ]
        docs = spark.createDataFrame(rows, "host string, keep boolean, lang string")
        got = {r["host"]: r for r in host_priors(docs).collect()}
        assert got["h1"]["n_docs"] == 3 and got["h1"]["n_kept"] == 2
        assert got["h1"]["keep_ppm"] == 666666  # floor(2e6/3)
        assert got["h1"]["top_lang"] == "en"
        # tie between fr and es (1 each) breaks lexicographically -> es
        assert got["h2"]["top_lang"] == "es"
        assert got["h3"]["keep_ppm"] == 0


class TestDrainPlan:
    def test_budgets_and_ceiling(self, spark):
        from web_scrapper_spark.frontier.core import NO_LIMIT_BUDGET, drain_plan

        frontier = spark.createDataFrame(
            [("a",)] * 7 + [("b",)] * 61 + [("c",)] * 5 + [("d",)] * 3,
            "host string",
        )
        robots = spark.createDataFrame(
            [("a", 10.0), ("b", 2.0), ("c", 0.0)],
            "host string, crawl_delay double",
        )
        got = {
            r["host"]: r
            for r in drain_plan(
                frontier, robots, epoch_seconds=60.0, default_delay=2.0
            ).collect()
        }
        assert (got["a"]["budget"], got["a"]["epochs_to_drain"]) == (6, 2)
        assert (got["b"]["budget"], got["b"]["epochs_to_drain"]) == (30, 3)
        assert got["c"]["budget"] == NO_LIMIT_BUDGET
        assert got["c"]["epochs_to_drain"] == 1
        # hostless default: 2s delay -> 30 slots
        assert (got["d"]["budget"], got["d"]["epochs_to_drain"]) == (30, 1)

    def test_no_robots(self, spark):
        from web_scrapper_spark.frontier.core import drain_plan

        frontier = spark.createDataFrame([("x",)] * 31, "host string")
        got = drain_plan(frontier, None, 60.0, 2.0).collect()[0]
        assert (got["budget"], got["epochs_to_drain"]) == (30, 2)


class TestUnicodeClean:
    def _run(self, spark, text):
        from web_scrapper_spark.operators.textops import unicode_clean

        df = spark.createDataFrame([(1, text)], "doc_id long, text string")
        return unicode_clean(df).collect()[0]

    def test_mojibake_nfc_controls(self, spark):
        r = self._run(
            spark,
            "cafÃ© â€™tis é \x02ok\r\nend\rx",
        )
        assert r["text"] == "café ’tis é ok\nend\nx"
        assert r["changed"] is True

    def test_clean_text_unchanged(self, spark):
        r = self._run(spark, "plain ascii text\nwith newline")
        assert r["text"] == "plain ascii text\nwith newline"
        assert r["changed"] is False

    def test_tab_and_newline_survive(self, spark):
        r = self._run(spark, "a\tb\nc")
        assert r["text"] == "a\tb\nc"


class TestRandomizedModelEquivalence:
    """Seeded randomized inputs checked against pure-Python models —
    the Spark-operator analogue of the hypothesis suite (one Spark job
    per seed, not per example)."""

    def test_resolve_redirects_matches_python_walk(self, spark):
        import random

        from web_scrapper_spark.operators.graph import resolve_redirects

        for seed in (7, 23):
            rng = random.Random(seed)
            n = 150
            # ~60% of nodes redirect somewhere (self-loops + cycles
            # arise naturally); targets may be non-sources (terminals)
            ptr = {
                f"n{i}": f"n{rng.randrange(n)}"
                for i in range(n)
                if rng.random() < 0.6
            }
            max_hops = 8

            def walk(u):
                cur, hops = u, 0
                while cur in ptr:
                    if hops >= max_hops:
                        return (None, None, False)
                    cur, hops = ptr[cur], hops + 1
                return (cur, hops, True)

            edges = spark.createDataFrame(
                list(ptr.items()), "url string, target string"
            )
            got = {
                r["url"]: (r["final_url"], r["hops"], r["resolved"])
                for r in resolve_redirects(edges, max_hops=max_hops).collect()
            }
            assert set(got) == set(ptr)
            for u in ptr:
                assert got[u] == walk(u), (seed, u, got[u], walk(u))

    def test_cluster_representatives_matches_union_find(self, spark):
        import random

        from web_scrapper_spark.operators.dedup import cluster_representatives

        for seed in (3, 11):
            rng = random.Random(seed)
            n = 80
            docs_rows = [(i, rng.randrange(1000)) for i in range(n)]
            edges = [
                (rng.randrange(n), rng.randrange(n)) for _ in range(40)
            ]
            edges = [(a, b) for a, b in edges if a != b]

            parent = list(range(n))

            def find(x):
                while parent[x] != x:
                    parent[x] = parent[parent[x]]
                    x = parent[x]
                return x

            for a, b in edges:
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
            clustered_nodes = {x for e in edges for x in e}
            comp = {
                i: (find(i) if i in clustered_nodes else i) for i in range(n)
            }
            quality = dict(docs_rows)
            best = {}
            size = {}
            for i in range(n):
                c = comp[i]
                size[c] = size.get(c, 0) + 1
                cand = (quality[i], -i)
                if c not in best or cand > best[c]:
                    best[c] = cand
            expect = {
                i: (comp[i], (quality[i], -i) == best[comp[i]], size[comp[i]])
                for i in range(n)
            }

            docs = spark.createDataFrame(docs_rows, "doc_id long, n_chars long")
            pairs = spark.createDataFrame(edges, "id_a long, id_b long")
            got = {
                r["doc_id"]: (r["component"], r["keep"], r["cluster_size"])
                for r in cluster_representatives(
                    docs, pairs, quality_col="n_chars"
                ).collect()
            }
            assert got == expect, seed


class TestSrpLsh:
    def test_self_match_and_recall(self, spark):
        from web_scrapper_spark.operators import similarity as sim

        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        queries = emb.filter("vec_id < 4").selectExpr(
            "vec_id as query_id", "embedding"
        )
        approx = sim.srp_topk(queries, emb, k=3)
        exact = sim.cosine_topk(queries, emb, k=3)
        # rank 1 is always the query itself (cos=1 collides on every band)
        r1 = {r["query_id"]: r["vec_id"] for r in approx.collect() if r["rank"] == 1}
        assert all(q == v for q, v in r1.items())
        assert sim.recall_at_k(approx, exact) >= 0.5

    def test_signature_deterministic_under_partitioning(self, spark):
        from web_scrapper_spark.operators import similarity as sim

        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        signs = sim.srp_signs(8, len(emb.select("embedding").head()[0]))
        a = sim.srp_bands(emb, "vec_id", "embedding", signs, band_size=2)
        b = sim.srp_bands(
            emb.repartition(7), "vec_id", "embedding", signs, band_size=2
        )
        assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))

    def test_sign_matrix_fixed(self):
        from web_scrapper_spark.operators.similarity import srp_signs

        s = srp_signs(2, 4)
        assert len(s) == 2 and len(s[0]) == 4
        assert s == srp_signs(2, 4)
        assert all(x in (-1, 1) for row in s for x in row)


class TestBpePairCounts:
    def test_hand_counted(self, spark):
        from web_scrapper_spark.operators.textops import bpe_pair_counts

        docs = spark.createDataFrame(
            [(1, "low lower low"), (2, "lowest low")],
            "doc_id long, text string",
        )
        got = {r["pair"]: r["freq"] for r in bpe_pair_counts(docs, k=20).collect()}
        # word table: low:3, lower:1, lowest:1
        assert got["l o"] == 5 and got["o w"] == 5
        assert got["w </w>"] == 3
        assert got["w e"] == 2
        assert got["t </w>"] == 1  # lowest's final pair

    def test_single_char_word_contributes_end_pair(self, spark):
        from web_scrapper_spark.operators.textops import bpe_pair_counts

        docs = spark.createDataFrame([(1, "9 9 q")], "doc_id long, text string")
        got = {r["pair"]: r["freq"] for r in bpe_pair_counts(docs).collect()}
        # freq-weighted: '9' occurs twice in the corpus
        assert got == {"9 </w>": 2, "q </w>": 1}


class TestHostBoilerplate:
    def test_chrome_flagged_prose_not(self, spark):
        from web_scrapper_spark.operators.quality import host_boilerplate

        nav = '<div class="nav"><a href="/">Home page link here</a></div>'
        rows = []
        for i in range(6):
            html = f"<html><body>{nav}<p>unique prose number {i} is long</p></body></html>"
            rows.append((f"https://h.org/p/{i}", html))
        # second host below min_pages: nothing flagged
        rows += [("https://tiny.org/1", f"<html><body>{nav}</body></html>")]
        pages = spark.createDataFrame(rows, "url string, html string")
        out = host_boilerplate(pages, min_pages=5).collect()
        by_host = {}
        for r in out:
            by_host.setdefault(r["host"], []).append(r)
        h = by_host["h.org"]
        flagged = [r for r in h if r["is_boilerplate"]]
        assert len(flagged) == 1 and flagged[0]["block_pages"] == 6
        assert flagged[0]["frac_ppm"] == 1_000_000
        prose = [r for r in h if not r["is_boilerplate"]]
        assert all(r["block_pages"] == 1 for r in prose)
        assert all(not r["is_boilerplate"] for r in by_host["tiny.org"])

    def test_within_page_repeat_counts_once(self, spark):
        from web_scrapper_spark.operators.quality import host_boilerplate

        html = "<p>twice on one page</p><p>twice on one page</p>"
        pages = spark.createDataFrame(
            [("https://h.org/a", html)], "url string, html string"
        )
        r = host_boilerplate(pages, min_pages=1).collect()[0]
        assert r["block_pages"] == 1 and r["host_pages"] == 1


class TestJsonLd:
    def test_fields_and_malformed(self, spark):
        from web_scrapper_spark.operators.structured import jsonld_extract

        html = (
            "<html><head>"
            "<script type='application/ld+json'>"
            '{"@type":"Article","headline":"H1","author":{"name":"A"}}'
            "</script>"
            '<script data-x="1" type="application/ld+json">'
            '{"@type":"Product","offers":{"price":9.5,"priceCurrency":"EUR"}}'
            "</script>"
            "<script type='application/ld+json'>{broken</script>"
            "<script type='text/javascript'>var x = 1;</script>"
            "</head></html>"
        )
        pages = spark.createDataFrame([("u", html)], "url string, html string")
        got = {r["block_pos"]: r for r in jsonld_extract(pages).collect()}
        assert len(got) == 3  # plain JS script excluded
        assert (got[0]["jsonld_type"], got[0]["headline"], got[0]["author_name"]) == (
            "Article", "H1", "A",
        )
        assert (got[1]["jsonld_type"], got[1]["price"], got[1]["currency"]) == (
            "Product", "9.5", "EUR",
        )
        assert got[2]["jsonld_type"] is None  # malformed → NULLs, no error

    def test_no_blocks_no_rows(self, spark):
        from web_scrapper_spark.operators.structured import jsonld_extract

        pages = spark.createDataFrame(
            [("u", "<html><body>plain</body></html>")], "url string, html string"
        )
        assert jsonld_extract(pages).count() == 0


class TestDetectCharset:
    def test_bom_meta_xml_default(self, spark):
        from web_scrapper_spark.operators.structured import detect_charset

        rows = [
            ("u1", b"\xef\xbb\xbf<html>x</html>"),
            ("u2", b"\xff\xfe<h>"),
            ("u3", b"\xfe\xff<h>"),
            ("u4", b"<html><meta charset='ISO-8859-1'></html>"),
            ("u5", b"<html><meta http-equiv=Content-Type "
                   b"content='text/html; charset=windows-1252'></html>"),
            ("u6", b"<?xml version='1.0' encoding=\"Shift_JIS\"?><p/>"),
            ("u7", b"<html>nothing declared</html>"),
        ]
        df = spark.createDataFrame(rows, "url string, html binary")
        got = {
            r["url"]: (r["charset"], r["charset_source"])
            for r in detect_charset(df).collect()
        }
        assert got["u1"] == ("utf-8", "bom")
        assert got["u2"] == ("utf-16le", "bom")
        assert got["u3"] == ("utf-16be", "bom")
        assert got["u4"] == ("iso-8859-1", "meta")
        assert got["u5"] == ("windows-1252", "meta")
        assert got["u6"] == ("shift_jis", "meta")
        assert got["u7"] == ("utf-8", "default")

    def test_bom_beats_meta_and_sniff_bound(self, spark):
        from web_scrapper_spark.operators.structured import detect_charset

        rows = [
            ("u1", b"\xef\xbb\xbf<meta charset='latin-1'>"),
            ("u2", b" " * 2000 + b"<meta charset='latin-1'>"),  # past bound
        ]
        df = spark.createDataFrame(rows, "url string, html binary")
        got = {
            r["url"]: (r["charset"], r["charset_source"])
            for r in detect_charset(df).collect()
        }
        assert got["u1"] == ("utf-8", "bom")
        assert got["u2"] == ("utf-8", "default")


class TestPageMeta:
    def test_fields_orders_and_nulls(self, spark):
        from web_scrapper_spark.operators.structured import page_meta

        rows = [
            ("u1", "<html><head><title> My \n Page </title>"
                   "<meta name='description' content='A desc.'>"
                   "<meta content='OG T' property='og:title'>"
                   "<meta property='og:image' content='https://i/x.png'>"
                   "</head></html>"),
            ("u2", "<html><body>bare</body></html>"),
        ]
        df = spark.createDataFrame(rows, "url string, html string")
        got = {r["url"]: r for r in page_meta(df).collect()}
        r = got["u1"]
        assert r["title"] == "My Page"
        assert r["meta_description"] == "A desc."
        assert r["og_title"] == "OG T"  # reversed attribute order
        assert r["og_image"] == "https://i/x.png"
        assert all(got["u2"][c] is None for c in
                   ("title", "meta_description", "og_title", "og_image"))


class TestBuildPostings:
    """Blocked inverted index (textops.build_postings)."""

    def _docs(self, spark, rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_tf_df_and_alignment(self, spark):
        from web_scrapper_spark.operators.textops import build_postings

        rows = [(1, "alpha beta alpha"), (2, "alpha gamma"), (3, "beta beta")]
        out = {
            r["term"]: r
            for r in build_postings(self._docs(spark, rows), 3).collect()
        }
        # every term df>=1 kept at defaults; hapax gamma included
        assert out["alpha"]["df"] == 2
        assert list(out["alpha"]["doc_ids"]) == [1, 2]
        assert list(out["alpha"]["tfs"]) == [2, 1]
        assert list(out["beta"]["doc_ids"]) == [1, 3]
        assert list(out["beta"]["tfs"]) == [1, 2]
        assert out["gamma"]["df"] == 1

    def test_df_gates_drop_hapax_and_stopwords(self, spark):
        from web_scrapper_spark.operators.textops import build_postings

        rows = [(i, "the unique%d word" % i) for i in range(10)]
        out = build_postings(
            self._docs(spark, rows), 10, min_df=2, max_df_ppm=900_000
        ).collect()
        terms = {r["term"] for r in out}
        # 'the'/'word' df=10 > 90% gate; unique* df=1 < 2 -> nothing left
        assert terms == set()

    def test_blocking_splits_in_doc_order(self, spark):
        from web_scrapper_spark.operators.textops import build_postings

        rows = [(i, "common") for i in range(7)]
        out = sorted(
            build_postings(
                self._docs(spark, rows), 7, block_size=3
            ).collect(),
            key=lambda r: r["block"],
        )
        assert [r["block"] for r in out] == [0, 1, 2]
        assert [list(r["doc_ids"]) for r in out] == [[0, 1, 2], [3, 4, 5], [6]]
        assert all(r["df"] == 7 for r in out)

    def test_bad_block_size_raises(self, spark):
        import pytest as _pytest

        from web_scrapper_spark.operators.textops import build_postings

        with _pytest.raises(ValueError):
            build_postings(self._docs(spark, [(1, "x")]), 1, block_size=0)

    def test_string_ids_fall_back_to_plain_window(self, spark):
        """Regression (round-5 advice): the skew-proof blocking buckets
        by shiftright(doc_id, 56), which needs an integral id — string
        ids (valid for every other postings consumer) used to die in
        analysis with a raw error. They must degrade to the constant-
        bucket path: identical ordered blocking, no skew protection."""
        from web_scrapper_spark.operators.textops import build_postings

        rows = [("d%02d" % i, "common") for i in range(7)]
        docs = spark.createDataFrame(rows, "doc_id string, text string")
        out = sorted(
            build_postings(docs, 7, block_size=3).collect(),
            key=lambda r: r["block"],
        )
        assert [r["block"] for r in out] == [0, 1, 2]
        assert [list(r["doc_ids"]) for r in out] == [
            ["d00", "d01", "d02"], ["d03", "d04", "d05"], ["d06"]]


class TestBm25Search:
    """DAAT BM25 retrieval over the blocked index
    (textops.bm25_search)."""

    ROWS = [
        (1, "alpha beta alpha gamma"),
        (2, "alpha gamma gamma"),
        (3, "beta beta delta"),
        (4, "alpha beta gamma delta"),
    ]

    def _index(self, spark, include_dls=True):
        from web_scrapper_spark.operators.textops import (
            build_postings,
            doc_lengths,
        )

        docs = spark.createDataFrame(self.ROWS, "doc_id long, text string")
        dls = doc_lengths(docs)
        tot = dls.groupBy().agg(
            F.count("*").alias("n"), F.sum("dl").alias("t")
        ).collect()[0]
        idx = build_postings(docs, int(tot["n"]), include_dls=include_dls)
        return docs, dls, idx, int(tot["n"]), int(tot["t"])

    def _python_scores(self, query_terms, n, t):
        """Plain-python replay of the exact integer formula."""
        import math
        import re

        tok = lambda s: [w for w in re.split(r"[^a-z0-9_]+", s.lower()) if w]
        docs = {i: tok(text) for i, text in self.ROWS}
        dl = {i: len(ws) for i, ws in docs.items()}
        scores: dict[int, list[int]] = {}
        for term in dict.fromkeys(query_terms):
            df = sum(1 for ws in docs.values() if term in ws)
            if df == 0:
                continue
            idf = math.floor(
                math.log(float(2 * (n + 1)) / (2 * df + 1)) * 1_000_000 + 0.5
            )
            for i, ws in docs.items():
                tf = ws.count(term)
                if tf:
                    s = (idf * 44 * tf * t) // (
                        20 * tf * t + 6 * t + 18 * dl[i] * n
                    )
                    scores.setdefault(i, []).append(s)
        return {i: (sum(v), len(v)) for i, v in scores.items()}

    def test_matches_python_replay(self, spark):
        from web_scrapper_spark.operators.textops import bm25_search

        _, _, idx, n, t = self._index(spark)
        qdf = spark.createDataFrame(
            [(1, "alpha delta")], "query_id long, text string"
        )
        out = bm25_search(idx, qdf, n, t, k=10).collect()
        expect = self._python_scores(["alpha", "delta"], n, t)
        got = {r["doc_id"]: (r["score_u"], r["n_terms"]) for r in out}
        assert got == expect
        # rank order = (score desc, doc_id asc), dense from 1
        by_rank = sorted(out, key=lambda r: r["rank"])
        assert [r["rank"] for r in by_rank] == list(range(1, len(out) + 1))
        assert all(
            (a["score_u"], -a["doc_id"]) >= (b["score_u"], -b["doc_id"])
            for a, b in zip(by_rank, by_rank[1:])
        )

    def test_norms_in_postings_equals_lengths_join(self, spark):
        from web_scrapper_spark.operators.textops import bm25_search

        _, dls, idx_d, n, t = self._index(spark, include_dls=True)
        _, _, idx_j, _, _ = self._index(spark, include_dls=False)
        qdf = spark.createDataFrame(
            [(1, "alpha beta"), (2, "gamma")], "query_id long, text string"
        )
        a = sorted(
            map(tuple, bm25_search(idx_d, qdf, n, t, k=3).collect())
        )
        b = sorted(
            map(
                tuple,
                bm25_search(idx_j, qdf, n, t, doc_lens=dls, k=3).collect(),
            )
        )
        assert a == b and len(a) > 0

    def test_duplicate_query_terms_collapse(self, spark):
        from web_scrapper_spark.operators.textops import bm25_search

        _, _, idx, n, t = self._index(spark)
        once = spark.createDataFrame(
            [(1, "alpha")], "query_id long, text string"
        )
        thrice = spark.createDataFrame(
            [(1, "alpha alpha alpha")], "query_id long, text string"
        )
        assert sorted(
            map(tuple, bm25_search(idx, once, n, t).collect())
        ) == sorted(map(tuple, bm25_search(idx, thrice, n, t).collect()))

    def test_duplicate_query_rows_collapse(self, spark):
        # duplicate query_id ROWS (not just terms within a row) must
        # not double-count score_u / n_terms
        from web_scrapper_spark.operators.textops import bm25_search

        _, _, idx, n, t = self._index(spark)
        once = spark.createDataFrame(
            [(1, "alpha delta")], "query_id long, text string"
        )
        dup = spark.createDataFrame(
            [(1, "alpha delta"), (1, "alpha delta"), (1, "delta alpha")],
            "query_id long, text string",
        )
        assert sorted(
            map(tuple, bm25_search(idx, once, n, t).collect())
        ) == sorted(map(tuple, bm25_search(idx, dup, n, t).collect()))

    def test_k_bounds_results(self, spark):
        from web_scrapper_spark.operators.textops import bm25_search

        _, _, idx, n, t = self._index(spark)
        qdf = spark.createDataFrame(
            [(1, "alpha beta gamma delta")], "query_id long, text string"
        )
        out = bm25_search(idx, qdf, n, t, k=2).collect()
        assert len(out) == 2 and {r["rank"] for r in out} == {1, 2}

    def test_missing_norms_raises(self, spark):
        import pytest as _pytest

        from web_scrapper_spark.operators.textops import bm25_search

        _, _, idx, n, t = self._index(spark, include_dls=False)
        qdf = spark.createDataFrame(
            [(1, "alpha")], "query_id long, text string"
        )
        with _pytest.raises(ValueError):
            bm25_search(idx, qdf, n, t)
        with _pytest.raises(ValueError):
            bm25_search(idx, qdf, 0, t)


class TestDistributionDrift:
    """Corpus-mix drift (quality.distribution_drift): exact integer
    total variation vs a reference group."""

    def _drift(self, spark, rows, ref=0):
        from web_scrapper_spark.operators.quality import distribution_drift

        df = spark.createDataFrame(rows, "grp long, bucket string")
        return distribution_drift(df, "grp", "bucket", ref).collect()

    def test_identical_mix_is_zero(self, spark):
        rows = [(g, b) for g in (0, 1) for b in ("a", "a", "b")]
        out = self._drift(spark, rows)
        assert all(r["tv_ppm"] == 0 for r in out)
        assert {r["share_ppm"] for r in out} == {666666, 333333}

    def test_disjoint_support_is_full_million(self, spark):
        rows = [(0, "a"), (0, "a"), (1, "b")]
        out = {(r["group"], r["bucket"]): r for r in self._drift(spark, rows)}
        # grid fills the absent combos with 0
        assert out[(1, "a")]["n"] == 0 and out[(0, "b")]["n"] == 0
        assert out[(1, "a")]["tv_ppm"] == 1_000_000
        assert out[(0, "a")]["tv_ppm"] == 0  # reference vs itself

    def test_half_shift(self, spark):
        # ref 50/50; group 1 100/0 -> tv = (500000+500000)/2
        rows = [(0, "a"), (0, "b"), (1, "a"), (1, "a")]
        out = {r["group"]: r["tv_ppm"] for r in self._drift(spark, rows)}
        assert out[1] == 500000


class TestAsofJoin:
    """Distributed backward as-of join (operators/asof.py)."""

    def _join(self, spark, left_rows, right_rows, **kw):
        from web_scrapper_spark.operators.asof import asof_join

        l = spark.createDataFrame(left_rows, "k long, qts long, tag string")
        r = spark.createDataFrame(right_rows, "k long, cts long, v string")
        return asof_join(
            l, r, "k", left_ts="qts", right_ts="cts", **kw
        ).collect()

    def test_latest_at_or_before_with_tie_inclusive(self, spark):
        out = {
            (r["k"], r["qts"]): (r["asof_cts"], r["asof_v"])
            for r in self._join(
                spark,
                [(1, 15, "x"), (1, 20, "y"), (1, 5, "z"), (2, 100, "w")],
                [(1, 10, "a"), (1, 20, "b"), (2, 5, "c")],
            )
        }
        assert out[(1, 15)] == (10, "a")
        assert out[(1, 20)] == (20, "b")   # equal ts matches (inclusive)
        assert out[(1, 5)] == (None, None)  # nothing earlier -> NULLs
        assert out[(2, 100)] == (5, "c")

    def test_left_columns_survive_and_row_count_is_left(self, spark):
        rows = self._join(
            spark,
            [(1, 15, "x"), (1, 16, "x2")],
            [(1, 10, "a")],
        )
        assert len(rows) == 2
        assert {r["tag"] for r in rows} == {"x", "x2"}

    def test_partitioning_independent(self, spark):
        from web_scrapper_spark.operators.asof import asof_join

        l = spark.range(200).selectExpr(
            "id % 7 as k", "id as qts", "'t' as tag"
        )
        r = spark.range(60).selectExpr(
            "id % 7 as k", "id * 3 as cts", "concat('v', id) as v"
        )
        a = asof_join(l, r, "k", left_ts="qts", right_ts="cts").collect()
        b = asof_join(
            l.repartition(13), r.repartition(5), "k",
            left_ts="qts", right_ts="cts",
        ).collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))

    def test_no_payload_raises(self, spark):
        import pytest as _pytest

        from web_scrapper_spark.operators.asof import asof_join

        df = spark.createDataFrame([(1,)], "k long")
        with _pytest.raises(ValueError):
            asof_join(df, df, "k", left_ts="k", right_ts="k")

    def test_matched_rows_null_field_not_backfilled(self, spark):
        """The carried payload is one struct: a matched right row's
        legitimate NULL field must stay NULL, never be filled from an
        OLDER right row (per-column last(ignorenulls) would fabricate
        a merged row that never existed)."""
        from web_scrapper_spark.operators.asof import asof_join

        l = spark.createDataFrame([(1, 3)], "k long, qts long")
        r = spark.createDataFrame(
            [(1, 1, 200, "abc"), (1, 2, 304, None)],
            "k long, cts long, status long, etag string",
        )
        out = asof_join(l, r, "k", left_ts="qts", right_ts="cts").collect()[0]
        assert (out["asof_cts"], out["asof_status"], out["asof_etag"]) == (
            2, 304, None,
        )

    def test_right_ts_ties_deterministic(self, spark):
        """Two right rows tied on (key, ts): the max payload struct
        wins — a pure function of the data, independent of input
        partitioning."""
        from web_scrapper_spark.operators.asof import asof_join

        l = spark.createDataFrame([(1, 9)], "k long, qts long")
        r_rows = [(1, 5, "aaa"), (1, 5, "bbb")]
        for perm in (r_rows, list(reversed(r_rows))):
            for parts in (1, 4):
                r = spark.createDataFrame(
                    perm, "k long, cts long, digest string"
                ).repartition(parts)
                out = asof_join(
                    l, r, "k", left_ts="qts", right_ts="cts"
                ).collect()[0]
                assert out["asof_digest"] == "bbb"


class TestRangeJoin:
    """Exploded-bucketing range join (operators/asof.py range_join)."""

    def test_inclusive_bounds_and_overlaps(self, spark):
        from web_scrapper_spark.operators.asof import range_join

        points = spark.createDataFrame(
            [(0, 5), (1, 10), (2, 25), (3, 99)], "pid long, v long"
        )
        ranges = spark.createDataFrame(
            [("a", 0, 10), ("b", 10, 20), ("c", 50, 60)],
            "name string, lo long, hi long",
        )
        got = {
            (r["pid"], r["range_name"])
            for r in range_join(points, ranges, bucket_span=8).collect()
        }
        # v=10 hits BOTH a (inclusive hi) and b (inclusive lo);
        # v=25 and v=99 match nothing (inner semantics)
        assert got == {(0, "a"), (1, "a"), (1, "b")}

    def test_span_independence(self, spark):
        from web_scrapper_spark.operators.asof import range_join

        points = spark.range(300).selectExpr("id as pid", "id * 7 % 1000 as v")
        ranges = spark.createDataFrame(
            [(f"r{i}", i * 100, i * 100 + 99) for i in range(10)],
            "name string, lo long, hi long",
        )
        outs = [
            sorted(
                (r["pid"], r["range_name"])
                for r in range_join(points, ranges, bucket_span=s).collect()
            )
            for s in (3, 64, 1 << 20)
        ]
        assert outs[0] == outs[1] == outs[2]
        assert len(outs[0]) == 300  # the blocks tile [0, 1000) fully

    def test_bad_span_raises(self, spark):
        import pytest as _pytest

        from web_scrapper_spark.operators.asof import range_join

        df = spark.createDataFrame([(1,)], "v long")
        with _pytest.raises(ValueError):
            range_join(df, df.selectExpr("v as lo", "v as hi"), bucket_span=0)


class TestHostTriangles:
    def _out(self, spark, pairs):
        from web_scrapper_spark.operators.graph import host_triangles

        df = spark.createDataFrame(pairs, ["src_host", "dst_host"])
        return {
            r["host"]: (r["degree"], r["triangles"], r["cc_ppm"])
            for r in host_triangles(df).collect()
        }

    def test_k4_full_clustering(self, spark):
        verts = ["a", "b", "c", "d"]
        pairs = [(u, v) for u in verts for v in verts if u < v]
        out = self._out(spark, pairs)
        # K4: every vertex has degree 3, sits in C(3,2)=3 triangles, cc=1
        assert out == {v: (3, 3, 1_000_000) for v in verts}

    def test_cycle_no_triangles(self, spark):
        verts = [f"v{i}" for i in range(5)]
        pairs = [(verts[i], verts[(i + 1) % 5]) for i in range(5)]
        out = self._out(spark, pairs)
        assert all(v == (2, 0, 0) for v in out.values())

    def test_matches_bruteforce(self, spark):
        import itertools

        # deterministic pseudo-random graph on 12 vertices
        verts = [f"h{i}" for i in range(12)]
        pairs = [
            (verts[i], verts[j])
            for i, j in itertools.combinations(range(12), 2)
            if (i * 7 + j * 13) % 3 == 0
        ]
        out = self._out(spark, pairs)
        adj = {v: set() for v in verts}
        for u, v in pairs:
            adj[u].add(v)
            adj[v].add(u)
        for v in verts:
            deg = len(adj[v])
            tri = sum(
                1
                for x, y in itertools.combinations(sorted(adj[v]), 2)
                if y in adj[x]
            )
            expected_cc = 2 * tri * 1_000_000 // (deg * (deg - 1)) if deg >= 2 else 0
            if deg == 0:
                assert v not in out  # isolated vertices have no edges
            else:
                assert out[v] == (deg, tri, expected_cc)

    def test_direction_duplicates_selfloops_collapse(self, spark):
        pairs = [
            ("a", "b"), ("b", "a"), ("a", "b"),  # one undirected edge
            ("b", "c"), ("a", "c"),
            ("c", "c"),  # self loop dropped
        ]
        out = self._out(spark, pairs)
        assert out == {
            "a": (2, 1, 1_000_000),
            "b": (2, 1, 1_000_000),
            "c": (2, 1, 1_000_000),
        }

    def test_partitioning_independence(self, spark):
        import itertools

        verts = [f"h{i}" for i in range(10)]
        pairs = [
            (verts[i], verts[j])
            for i, j in itertools.combinations(range(10), 2)
            if (i + j) % 2 == 0
        ]
        from web_scrapper_spark.operators.graph import host_triangles

        df = spark.createDataFrame(pairs, ["src_host", "dst_host"])
        a = sorted(map(tuple, host_triangles(df.repartition(1)).collect()))
        b = sorted(
            map(tuple, host_triangles(df.repartition(7, "src_host")).collect())
        )
        assert a == b


class TestQuantizeEmbeddings:
    def test_codes_span_range_and_invert_monotonically(self, spark):
        from web_scrapper_spark.operators.similarity import quantize_embeddings

        vecs = spark.createDataFrame(
            [(i, [float(i), float(-i), 0.5]) for i in range(11)],
            "vec_id long, embedding array<float>",
        )
        out = {r["vec_id"]: r["qvec"] for r in quantize_embeddings(vecs).collect()}
        d0 = [out[i][0] for i in range(11)]
        d1 = [out[i][1] for i in range(11)]
        assert d0[0] == 0 and d0[-1] == 255 * 10_000_000 // 10_000_001
        assert d0 == sorted(d0)                    # monotone in the value
        assert d1 == sorted(d1, reverse=True)      # anti-monotone dim
        assert all(0 <= q <= 255 for qs in out.values() for q in qs)

    def test_constant_dimension_codes_to_zero(self, spark):
        from web_scrapper_spark.operators.similarity import quantize_embeddings

        vecs = spark.createDataFrame(
            [(1, [7.0, 1.0]), (2, [7.0, 2.0])],
            "vec_id long, embedding array<float>",
        )
        out = {r["vec_id"]: r["qvec"] for r in quantize_embeddings(vecs).collect()}
        assert out[1][0] == 0 and out[2][0] == 0

    def test_exact_floor_division_at_large_magnitude(self, spark):
        """Near the top of the exact-arithmetic domain the code must be
        the true integer floor — a rounded double quotient can round UP
        across an integer boundary where `//` truncates."""
        from web_scrapper_spark.operators.similarity import quantize_embeddings

        hi = float((1 << 44) // 1_000_000)  # ~1.75e7, inside the gate
        vals = [0.0, hi * 0.33, hi * 0.77, hi]
        vecs = spark.createDataFrame(
            [(i, [v, 1.0]) for i, v in enumerate(vals)],
            "vec_id long, embedding array<double>",
        )
        out = {
            r["vec_id"]: r["qvec"][0]
            for r in quantize_embeddings(vecs).collect()
        }
        import math

        micro = [math.floor(v * 1_000_000) for v in vals]
        lo, span = min(micro), max(micro) - min(micro) + 1
        for i, m in enumerate(micro):
            assert out[i] == ((m - lo) * 255) // span

    def test_component_outside_gate_raises(self, spark):
        import pytest as _pytest

        from web_scrapper_spark.operators.similarity import quantize_embeddings

        vecs = spark.createDataFrame(
            [(1, [1.0e9, 0.0])], "vec_id long, embedding array<double>"
        )
        with _pytest.raises(Exception, match="quantize_embeddings"):
            quantize_embeddings(vecs).collect()

    def test_matches_numpy_replay(self, spark):
        import math

        from web_scrapper_spark.operators.similarity import quantize_embeddings

        rows = [
            (i, [math.sin(i * 0.7 + j) for j in range(5)]) for i in range(40)
        ]
        vecs = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        got = {r["vec_id"]: list(r["qvec"]) for r in quantize_embeddings(vecs).collect()}
        import struct

        def f32(x):  # replicate float32 storage of the column
            return struct.unpack("f", struct.pack("f", x))[0]

        micro = {i: [math.floor(f32(v) * 1_000_000) for v in vs] for i, vs in rows}
        lo = [min(m[j] for m in micro.values()) for j in range(5)]
        hi = [max(m[j] for m in micro.values()) for j in range(5)]
        want = {
            i: [((m[j] - lo[j]) * 255) // (hi[j] - lo[j] + 1) for j in range(5)]
            for i, m in micro.items()
        }
        assert got == want


class TestKcenterSelect:
    """Greedy farthest-point selection (similarity.kcenter_select)."""

    def _vecs(self, spark, rows):
        return spark.createDataFrame(
            rows, "vec_id long, embedding array<float>"
        )

    @staticmethod
    def _python_kcenter(rows, k):
        """Plain-python greedy replay with the same integer gate."""
        import math

        pts = {
            i: [math.floor(float(x) * 1_000_000) for x in v]
            for i, v in rows
        }
        d2 = lambda a, b: sum((x - y) * (x - y) for x, y in zip(a, b))
        chosen = [min(pts)]
        mind = {i: d2(v, pts[chosen[0]]) for i, v in pts.items()}
        while len(chosen) < k and len(chosen) < len(pts):
            cand = [
                (-d, i) for i, d in mind.items() if i not in chosen
            ]
            chosen.append(min(cand)[1])
            for i, v in pts.items():
                mind[i] = min(mind[i], d2(v, pts[chosen[-1]]))
        assign = {}
        for i, v in pts.items():
            best = min(
                (d2(v, pts[c]), r + 1, c) for r, c in enumerate(chosen)
            )
            assign[i] = (best[2], best[1], best[0])
        return assign

    ROWS = [
        (0, [0.0, 0.0]),
        (1, [0.1, 0.0]),
        (2, [10.0, 0.0]),
        (3, [0.0, 10.0]),
        (4, [9.8, 0.1]),
        (5, [5.0, 5.0]),
    ]

    def test_matches_python_replay(self, spark):
        from web_scrapper_spark.operators.similarity import kcenter_select

        out = {
            r["vec_id"]: (r["center_id"], r["center_rank"], r["dist_u"])
            for r in kcenter_select(self._vecs(spark, self.ROWS), 3).collect()
        }
        assert out == self._python_kcenter(self.ROWS, 3)

    def test_centers_self_assign_and_spread(self, spark):
        from web_scrapper_spark.operators.similarity import kcenter_select

        out = kcenter_select(self._vecs(spark, self.ROWS), 3).collect()
        centers = {r["center_id"] for r in out}
        assert len(centers) == 3
        for r in out:
            if r["vec_id"] in centers and r["vec_id"] == r["center_id"]:
                assert r["dist_u"] == 0
        # seed is min id; round 2 must grab one of the far points
        ranks = {
            r["center_rank"]: r["center_id"]
            for r in out
            if r["vec_id"] == r["center_id"]
        }
        assert ranks[1] == 0 and ranks[2] in (2, 3)

    def test_k_exceeding_points_stops_early(self, spark):
        from web_scrapper_spark.operators.similarity import kcenter_select

        rows = self.ROWS[:2]
        out = kcenter_select(self._vecs(spark, rows), 5).collect()
        assert {r["center_id"] for r in out} == {0, 1}

    def test_partitioning_independence(self, spark):
        from web_scrapper_spark.operators.similarity import kcenter_select

        a = sorted(
            map(
                tuple,
                kcenter_select(self._vecs(spark, self.ROWS), 3).collect(),
            )
        )
        b = sorted(
            map(
                tuple,
                kcenter_select(
                    self._vecs(spark, self.ROWS).repartition(7), 3
                ).collect(),
            )
        )
        assert a == b

    def test_bad_k_raises(self, spark):
        import pytest as _pytest

        from web_scrapper_spark.operators.similarity import kcenter_select

        with _pytest.raises(ValueError):
            kcenter_select(self._vecs(spark, self.ROWS), 0)


class TestSqTopk:
    def test_recall_vs_exact_cosine(self, spark):
        import math

        from web_scrapper_spark.operators.similarity import (
            cosine_topk,
            quantize_embeddings,
            sq_topk,
        )

        rows = [
            (i, [math.sin(i * 0.31 + j * 1.7) for j in range(16)])
            for i in range(120)
        ]
        vecs = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        qv = quantize_embeddings(vecs)
        queries_q = qv.filter(F.col("vec_id") < 5).select(
            F.col("vec_id").alias("query_id"), "qvec"
        )
        got = sq_topk(queries_q, qv, k=10).collect()
        queries_f = vecs.filter(F.col("vec_id") < 5).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        exact = cosine_topk(queries_f, vecs, k=10).collect()
        g = {}
        for r in got:
            g.setdefault(r["query_id"], set()).add(r["vec_id"])
        e = {}
        for r in exact:
            e.setdefault(r["query_id"], set()).add(r["vec_id"])
        recalls = [len(g[q] & e[q]) / 10 for q in e]
        # symmetric uint8 dot vs float cosine: quantization + missing
        # normalization cost some tail overlap — the SQ trade the
        # docstring states (re-rank the shortlist for exactness)
        assert min(recalls) >= 0.5 and sum(recalls) / len(recalls) >= 0.7

    def test_self_match_ranks_first(self, spark):
        from web_scrapper_spark.operators.similarity import (
            quantize_embeddings,
            sq_topk,
        )

        vecs = spark.createDataFrame(
            [(1, [1.0, 0.0]), (2, [0.0, 1.0]), (3, [1.0, 1.0])],
            "vec_id long, embedding array<float>",
        )
        qv = quantize_embeddings(vecs)
        q = qv.filter(F.col("vec_id") == 1).select(
            F.col("vec_id").alias("query_id"), "qvec"
        )
        top = sq_topk(q, qv, k=1).first()
        # the dominant-dim vector scores highest with itself or the
        # all-ones vector; integer ties break on vec_id
        assert top["vec_id"] in (1, 3) and top["rank"] == 1


class TestCompressionRatio:
    def test_matches_stdlib_zlib(self, spark):
        import zlib

        from web_scrapper_spark.operators.quality import compression_ratio

        texts = [
            (0, "word " * 200),              # highly compressible
            (1, "".join(chr(33 + (i * 7919) % 90) for i in range(800))),
            (2, ""),                          # empty -> -1 sentinel
        ]
        docs = spark.createDataFrame(texts, "doc_id long, text string")
        out = {r["doc_id"]: r for r in compression_ratio(docs).collect()}
        for i, t in texts:
            raw = t.encode()
            comp = zlib.compress(raw, 6)
            want = len(comp) * 1_000_000 // len(raw) if raw else -1
            assert out[i]["ratio_ppm"] == want
            assert out[i]["raw_len"] == len(raw)
            assert out[i]["comp_len"] == len(comp)

    def test_gate_separates_template_from_prose(self, spark):
        from web_scrapper_spark.operators.quality import compression_ratio

        docs = spark.createDataFrame(
            [
                (0, "buy now click here " * 300),
                (1, "the quick brown fox jumps over one lazy dog while "
                    "seventeen sparrows argue about breadcrumbs near the "
                    "old fountain and a tired postman checks his watch"),
            ],
            "doc_id long, text string",
        )
        out = {
            r["doc_id"]: r["keep_compress"]
            for r in compression_ratio(docs, min_ratio_ppm=250_000).collect()
        }
        assert out == {0: False, 1: True}

    def test_empty_doc_flagged_not_null(self, spark):
        from web_scrapper_spark.operators.quality import compression_ratio

        docs = spark.createDataFrame([(0, None)], "doc_id long, text string")
        row = compression_ratio(docs).first()
        assert row["ratio_ppm"] == -1 and row["keep_compress"] is False


class TestCorpusCard:
    def test_hand_computed_card(self, spark):
        from web_scrapper_spark.operators.quality import corpus_card

        docs = spark.createDataFrame(
            [
                (0, "en", "a", "one two three"),        # 3 tok, 13 ch
                (1, "en", "a", "one two"),              # 2 tok, 7 ch
                (2, "en", "a", "one two three four"),   # 4 tok, 18 ch
                (3, "de", "a", "eins"),                 # 1 tok, 4 ch
            ],
            "doc_id long, lang string, source string, text string",
        )
        out = {
            (r["lang"], r["source"]): r for r in corpus_card(docs).collect()
        }
        en = out[("en", "a")]
        assert (en["n_docs"], en["total_chars"], en["total_tokens"]) == (3, 38, 9)
        assert (en["max_tokens"], en["median_tokens"]) == (4, 3)
        de = out[("de", "a")]
        assert (de["n_docs"], de["median_tokens"]) == (1, 1)

    def test_low_median_on_even_count(self, spark):
        from web_scrapper_spark.operators.quality import corpus_card

        docs = spark.createDataFrame(
            [(i, "en", "a", " ".join(["w"] * n)) for i, n in
             enumerate([1, 2, 3, 4])],
            "doc_id long, lang string, source string, text string",
        )
        row = corpus_card(docs).first()
        # low median of {1,2,3,4} = 2 (cum 2*2 >= 4 at tok=2)
        assert row["median_tokens"] == 2


class TestEmbeddingDecontaminate:
    def test_flags_exact_and_near_leaks_only(self, spark):
        from web_scrapper_spark.operators.quality import embedding_decontaminate

        corpus = spark.createDataFrame(
            [
                (0, [1.0, 0.0, 0.0]),   # exact leak of bench 100
                (1, [0.99, 0.14, 0.0]), # near-paraphrase of bench 100
                (2, [0.0, 1.0, 0.0]),   # exact leak of bench 101
                (3, [0.0, 0.0, 1.0]),   # clean
                (4, [-1.0, 0.0, 0.0]),  # anti-parallel: cos=-1, clean
            ],
            "vec_id long, embedding array<double>",
        )
        bench = spark.createDataFrame(
            [(100, [1.0, 0.0, 0.0]), (101, [0.0, 1.0, 0.0])],
            "vec_id long, embedding array<double>",
        )
        got = {
            r["vec_id"]: (r["n_bench_hits"], r["contam_keep"])
            for r in embedding_decontaminate(
                corpus, bench, threshold=0.95
            ).collect()
        }
        assert got == {
            0: (1, False),
            1: (1, False),
            2: (1, False),
            3: (0, True),
            4: (0, True),
        }

    def test_every_doc_appears_once(self, spark):
        from web_scrapper_spark.operators.quality import embedding_decontaminate

        corpus = spark.createDataFrame(
            [(i, [float(i), 1.0]) for i in range(20)],
            "vec_id long, embedding array<double>",
        )
        bench = corpus.filter("vec_id < 3")
        out = embedding_decontaminate(corpus, bench, threshold=0.999)
        assert out.count() == 20
        assert out.select("vec_id").distinct().count() == 20


class TestPerceptron:
    def _toy(self, spark):
        rows = []
        for i in range(30):
            good = i % 2 == 0
            text = (
                "excellent informative thorough research article "
                if good
                else "spam casino pills click buy now "
            ) + f"filler{i % 5} common words"
            rows.append((i, text, good))
        return spark.createDataFrame(rows, "doc_id long, text string, label boolean")

    def test_converges_and_separates(self, spark):
        from pyspark.sql import functions as F

        from web_scrapper_spark.operators.quality import (
            perceptron_score,
            perceptron_train,
        )

        docs = self._toy(spark)
        m = perceptron_train(docs, "label", iters=10, buckets=64)
        # early exit: converged before the iteration cap
        assert m["mistakes"][-1] == 0 and len(m["mistakes"]) < 10
        scored = perceptron_score(docs, m)
        errors = (
            scored.join(docs, "doc_id")
            .filter(F.col("label") != F.col("perc_keep"))
            .count()
        )
        assert errors == 0

    def test_training_is_partitioning_independent(self, spark):
        """Batch updates are order-free: any repartitioning of the
        input trains the IDENTICAL integer weight vector — the property
        that makes distributed training bit-reproducible."""
        from web_scrapper_spark.operators.quality import perceptron_train

        docs = self._toy(spark)
        m1 = perceptron_train(docs, "label", iters=5, buckets=64)
        m2 = perceptron_train(docs.repartition(13), "label", iters=5, buckets=64)
        m3 = perceptron_train(docs.coalesce(1), "label", iters=5, buckets=64)
        assert m1["w"] == m2["w"] == m3["w"]

    def test_first_iteration_updates_on_all_docs(self, spark):
        """With w=0 every margin is 0 and y·0 <= 0, so iteration 1
        counts every doc as misclassified — pins the margin-zero
        convention the oracle replays."""
        from web_scrapper_spark.operators.quality import perceptron_train

        docs = self._toy(spark)
        m = perceptron_train(docs, "label", iters=1, buckets=64)
        assert m["mistakes"][0] == 30


class TestExcerptPairs:
    def test_quote_inside_long_doc_is_found_directionally(self, spark):
        from web_scrapper_spark.operators.textops import excerpt_pairs

        quote = "the quick brown fox jumps over the lazy dog near the river bank"
        long_doc = (
            "opening paragraph about something else entirely with many words "
            * 5
            + quote
            + " closing commentary that keeps going on and on about the topic "
            * 5
        )
        docs = spark.createDataFrame(
            [
                (1, quote),                 # the excerpt
                (2, long_doc),              # its source
                (3, "completely unrelated text about cooking pasta at home"),
            ],
            "doc_id long, text string",
        )
        got = {
            (r["excerpt_id"], r["source_id"]): r
            for r in excerpt_pairs(docs, containment_centi=80, min_fps=2).collect()
        }
        assert (1, 2) in got
        assert got[(1, 2)]["containment_centi"] >= 80
        # the direction matters: the long doc is NOT contained in the quote
        assert (2, 1) not in got
        assert not any(3 in pair for pair in got)

    def test_mutual_near_dups_appear_both_ways(self, spark):
        from web_scrapper_spark.operators.textops import excerpt_pairs

        text = "identical body shared by two documents with enough words to winnow"
        docs = spark.createDataFrame(
            [(1, text), (2, text)], "doc_id long, text string"
        )
        got = {
            (r["excerpt_id"], r["source_id"])
            for r in excerpt_pairs(docs, containment_centi=90, min_fps=2).collect()
        }
        assert got == {(1, 2), (2, 1)}


class TestLabelPropagation:
    @staticmethod
    def _py_lpa(edges, num_iters):
        und = set()
        for s, d in edges:
            if s != d:
                und.add((s, d))
                und.add((d, s))
        nbrs = {}
        for s, d in und:
            nbrs.setdefault(d, []).append(s)
        labels = {n: n for n in {x for e in und for x in e}}
        for _ in range(num_iters):
            nxt = {}
            for node, ins in nbrs.items():
                counts = {labels[node]: 1}  # self-vote
                for u in ins:
                    counts[labels[u]] = counts.get(labels[u], 0) + 1
                nxt[node] = min(counts, key=lambda l: (-counts[l], l))
            labels = nxt
        return labels

    def _run(self, spark, edges, num_iters=4):
        from web_scrapper_spark.operators.graph import label_propagation

        df = spark.createDataFrame(edges, "src string, dst string")
        return {
            r["node"]: r["community"]
            for r in label_propagation(df, num_iters=num_iters).collect()
        }

    def test_two_cliques_two_communities(self, spark):
        clique = lambda p, k: [  # noqa: E731
            (f"{p}{i}", f"{p}{j}") for i in range(k) for j in range(i + 1, k)
        ]
        got = self._run(spark, clique("a", 4) + clique("b", 4))
        assert {got[f"a{i}"] for i in range(4)} == {"a0"}
        assert {got[f"b{i}"] for i in range(4)} == {"b0"}

    def test_bridge_keeps_cliques_separate(self, spark):
        clique = lambda p, k: [  # noqa: E731
            (f"{p}{i}", f"{p}{j}") for i in range(k) for j in range(i + 1, k)
        ]
        edges = clique("a", 5) + clique("b", 5) + [("a0", "b0")]
        got = self._run(spark, edges)
        assert {got[f"a{i}"] for i in range(5)} == {"a0"}
        assert {got[f"b{i}"] for i in range(5)} == {"b0"}

    def test_matches_sequential_replay(self, spark):
        # irregular graph incl. a bipartite-ish region that 2-cycles
        # under synchronous LPA: the fixed-round output is still a
        # pure function of the edge set
        edges = [
            ("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"), ("d", "e"),
            ("e", "f"), ("f", "d"), ("g", "h"), ("x", "a"), ("x", "d"),
            ("b", "a"),  # duplicate in reverse: must dedup
        ]
        for iters in (1, 2, 3, 4, 7):
            want = self._py_lpa(edges, iters)
            got = self._run(spark, edges, num_iters=iters)
            assert got == want, iters

    def test_partitioning_independence(self, spark):
        from web_scrapper_spark.operators.graph import label_propagation

        edges = [(f"n{i}", f"n{(i * 3 + 1) % 17}") for i in range(40)]
        df = spark.createDataFrame(edges, "src string, dst string")
        a = {
            (r["node"], r["community"])
            for r in label_propagation(df.coalesce(1)).collect()
        }
        b = {
            (r["node"], r["community"])
            for r in label_propagation(df.repartition(16)).collect()
        }
        assert a == b

    def test_self_loops_ignored(self, spark):
        # the self-edge must not vote; a 2-node graph 2-cycles, so the
        # fixed-round output equals the sequential replay exactly
        edges = [("a", "a"), ("a", "b")]
        assert self._run(spark, edges) == self._py_lpa(edges, 4)


class TestTrustrank:
    """operators/graph.py — seed-personalized integer TrustRank."""

    def _sim(self, edges, seeds, iters=10, d=85):
        from collections import defaultdict

        from web_scrapper_spark.operators.graph import PAGERANK_SCALE as S

        nodes = sorted({u for e in edges for u in e} | set(seeds))
        deg = defaultdict(int)
        for s, _ in edges:
            deg[s] += 1
        r0 = S // len(set(seeds))
        base = ((100 - d) * r0) // 100
        r = {v: (r0 if v in seeds else 0) for v in nodes}
        for _ in range(iters):
            c = defaultdict(int)
            for s, t in edges:
                c[t] += r[s] // deg[s]
            r = {
                v: (base if v in seeds else 0) + (c[v] * d) // 100
                for v in nodes
            }
        return r

    def _run(self, spark, E, seeds, iters=10):
        from web_scrapper_spark.operators.graph import trustrank

        df = spark.createDataFrame(E, "src long, dst long")
        sd = spark.createDataFrame([(s,) for s in seeds], "node long")
        return {
            r["node"]: r["rank"]
            for r in trustrank(df, sd, num_iters=iters).collect()
        }

    def test_matches_integer_simulation(self, spark):
        E = [(1, 2), (1, 3), (2, 3), (3, 1), (4, 3), (5, 3), (5, 1)]
        got = self._run(spark, E, {1, 4})
        assert got == self._sim(E, {1, 4})

    def test_unreachable_link_farm_scores_zero(self, spark):
        # 10-12 form a dense farm with no in-path from the seed side:
        # plain PageRank pays them the teleport floor, TrustRank pays 0.
        E = [(1, 2), (2, 3)] + [
            (a, b) for a in (10, 11, 12) for b in (10, 11, 12) if a != b
        ]
        got = self._run(spark, E, {1})
        assert got[10] == got[11] == got[12] == 0
        assert got[2] > 0 and got[3] > 0

    def test_nonseed_without_inlinks_is_zero(self, spark):
        E = [(1, 2), (4, 2)]  # 4 is a non-seed root
        got = self._run(spark, E, {1}, iters=3)
        assert got[4] == 0
        assert got == self._sim(E, {1}, iters=3)

    def test_isolated_seed_counts_toward_share(self, spark):
        # seed 99 has no edges: it keeps its teleport share and halves
        # seed 1's — |S| = 2 in both engines.
        E = [(1, 2)]
        got = self._run(spark, E, {1, 99}, iters=2)
        assert got == self._sim(E, {1, 99}, iters=2)
        assert 99 in got and got[99] > 0

    def test_determinism_across_partitionings(self, spark):
        from web_scrapper_spark.operators.graph import trustrank

        E = [(i, (i * 7 + 3) % 40) for i in range(40)] + [
            (i, (i * 11 + 1) % 40) for i in range(40)
        ]
        seeds = [(i,) for i in range(0, 40, 9)]
        df1 = spark.createDataFrame(E, "src long, dst long").repartition(1)
        df2 = spark.createDataFrame(E, "src long, dst long").repartition(16)
        sd = spark.createDataFrame(seeds, "node long")
        r1 = {r["node"]: r["rank"] for r in trustrank(df1, sd, num_iters=6).collect()}
        r2 = {r["node"]: r["rank"] for r in trustrank(df2, sd, num_iters=6).collect()}
        assert r1 == r2

    def test_spam_mass_ppm(self, spark):
        from web_scrapper_spark.operators.graph import spam_mass

        pr = spark.createDataFrame(
            [(1, 1000), (2, 400), (3, 250)], "node long, rank long"
        )
        tr = spark.createDataFrame([(1, 900), (3, 300)], "node long, rank long")
        got = {
            r["node"]: (r["trust_fp"], r["spam_mass_ppm"])
            for r in spam_mass(pr, tr).collect()
        }
        assert got[1] == (900, (1000 - 900) * 10**6 // 1000)
        # absent from trust → full spam mass
        assert got[2] == (0, 10**6)
        # trust above rank share → clamped at 0
        assert got[3] == (300, 0)

    def test_spam_mass_scores_matches_sequential_composition(self, spark):
        # the concurrent shared-edge composition must be bit-identical
        # to running the two propagations independently
        from web_scrapper_spark.operators.graph import (
            pagerank,
            spam_mass,
            spam_mass_scores,
            trustrank,
        )

        E = [(i, (i * 7 + 3) % 30) for i in range(30)] + [
            (i, (i * 13 + 5) % 30) for i in range(30)
        ]
        edges = spark.createDataFrame(E, "src long, dst long")
        seeds = spark.createDataFrame([(0,), (9,), (18,)], "node long")
        fused = {
            r["node"]: (r["rank_fp"], r["trust_fp"], r["spam_mass_ppm"])
            for r in spam_mass_scores(edges, seeds, num_iters=5).collect()
        }
        pr = pagerank(edges, num_iters=5)
        tr = trustrank(edges, seeds, num_iters=5)
        seq = {
            r["node"]: (r["rank_fp"], r["trust_fp"], r["spam_mass_ppm"])
            for r in spam_mass(pr, tr).collect()
        }
        assert fused == seq


class TestMetaRobots:
    """operators/structured.py — robots meta directives + rel=nofollow."""

    def _flags(self, spark, html):
        from web_scrapper_spark.operators.structured import meta_robots

        df = spark.createDataFrame([("u", html)], "url string, html string")
        r = meta_robots(df).collect()[0]
        return (r["noindex"], r["nofollow"])

    def test_no_tag(self, spark):
        assert self._flags(spark, "<html><head></head></html>") == (False, False)

    def test_noindex_only(self, spark):
        h = '<meta name="robots" content="noindex">'
        assert self._flags(spark, h) == (True, False)

    def test_reversed_attr_order(self, spark):
        h = '<meta content="nofollow" name="robots">'
        assert self._flags(spark, h) == (False, True)

    def test_combined_and_whitespace_and_case(self, spark):
        h = '<META NAME="ROBOTS" CONTENT=" NoIndex , NOFOLLOW ">'
        assert self._flags(spark, h) == (True, True)

    def test_none_means_both(self, spark):
        assert self._flags(spark, "<meta name='robots' content='none'>") == (
            True,
            True,
        )

    def test_all_is_noop(self, spark):
        assert self._flags(spark, "<meta name='robots' content='all'>") == (
            False,
            False,
        )

    def test_multiple_tags_union(self, spark):
        h = (
            '<meta name="robots" content="noindex">'
            '<meta name="robots" content="nofollow">'
        )
        assert self._flags(spark, h) == (True, True)

    def test_substring_directive_does_not_match(self, spark):
        h = '<meta name="robots" content="noindexing">'
        assert self._flags(spark, h) == (False, False)

    def test_tab_newline_separated_directives(self, spark):
        """trim() strips only spaces; the grammar is whitespace-tolerant
        across tabs/newlines too — and the Spark path must agree with
        the sequential twin byte-for-byte."""
        from web_scrapper_spark.operators.structured import parse_meta_robots

        h = '<meta name="robots" content="noindex,\n\tnofollow">'
        assert self._flags(spark, h) == (True, True)
        assert parse_meta_robots(h) == (True, True)

    def test_nofollow_links_token_exact(self, spark):
        from web_scrapper_spark.operators.structured import nofollow_links

        html = (
            '<a href="/a" rel="nofollow">x</a>'
            '<a href="/b" rel="ugc nofollow">y</a>'
            '<a href="/c" rel="nofollowother">z</a>'
            '<a href="/d">plain</a>'
            '<a rel="nofollow">no href</a>'
            '<a rel="NOFOLLOW" href="/e">rel first</a>'
        )
        df = spark.createDataFrame([("u", html)], "url string, html string")
        got = sorted(r["target"] for r in nofollow_links(df).collect())
        assert got == ["/a", "/b", "/e"]

    def test_gates(self, spark):
        from web_scrapper_spark.operators.structured import (
            gate_nofollow_outlinks,
            gate_noindex,
            meta_robots,
        )

        pages = spark.createDataFrame(
            [
                ("u1", '<meta name="robots" content="noindex">doc1'),
                ("u2", "plain"),
                ("u3", '<meta name="robots" content="nofollow">doc3'),
            ],
            "url string, html string",
        )
        flags = meta_robots(pages)
        docs = pages.select("url")
        kept = sorted(r["url"] for r in gate_noindex(docs, flags).collect())
        assert kept == ["u2", "u3"]
        links = spark.createDataFrame(
            [("u1", "t1"), ("u2", "t2"), ("u3", "t3")],
            "src_url string, url string",
        )
        kept_links = sorted(
            r["src_url"] for r in gate_nofollow_outlinks(links, flags).collect()
        )
        assert kept_links == ["u1", "u2"]


class TestSetJoins:
    """operators/setjoin.py — containment + overlap set joins."""

    def _dfs(self, spark):
        corpus = spark.createDataFrame(
            [
                (1, ["a", "b", "c"]),
                (2, ["b", "c"]),
                (3, ["a", "b", "c", "d"]),
                (4, ["x", "y"]),
                (5, ["a"]),
                (6, []),
            ],
            "doc_id long, tokens array<string>",
        )
        queries = spark.createDataFrame(
            [
                (10, ["a", "b"]),
                (11, ["b", "c"]),
                (12, ["zzz"]),
                (13, []),
                (14, ["x", "y"]),
            ],
            "query_id long, tokens array<string>",
        )
        return queries, corpus

    def _brute(self, queries, corpus, pred):
        out = set()
        for qid, qs in queries:
            for cid, cs in corpus:
                if qs and pred(set(qs), set(cs)):
                    out.add((qid, cid))
        return out

    _CORPUS = [
        (1, ["a", "b", "c"]), (2, ["b", "c"]), (3, ["a", "b", "c", "d"]),
        (4, ["x", "y"]), (5, ["a"]), (6, []),
    ]
    _QUERIES = [
        (10, ["a", "b"]), (11, ["b", "c"]), (12, ["zzz"]), (13, []),
        (14, ["x", "y"]),
    ]

    def test_containment_matches_brute_force(self, spark):
        from web_scrapper_spark.operators.setjoin import set_containment_join

        q, c = self._dfs(spark)
        got = {
            (r["query_id"], r["doc_id"])
            for r in set_containment_join(q, c).collect()
        }
        want = self._brute(self._QUERIES, self._CORPUS, lambda a, b: a <= b)
        assert got == want
        assert (10, 1) in got and (10, 3) in got and (14, 4) in got
        assert not any(qid == 12 for qid, _ in got)  # absent token
        assert not any(qid == 13 for qid, _ in got)  # empty query

    def test_overlap_matches_brute_force(self, spark):
        from web_scrapper_spark.operators.setjoin import set_overlap_join

        q, c = self._dfs(spark)
        rows = set_overlap_join(q, c, min_overlap=2).collect()
        got = {(r["query_id"], r["doc_id"]): r["overlap"] for r in rows}
        want = {
            (qid, cid)
            for qid, cid in self._brute(
                self._QUERIES, self._CORPUS, lambda a, b: len(a & b) >= 2
            )
        }
        assert set(got) == want
        for (qid, cid), ov in got.items():
            qs = dict(self._QUERIES)[qid]
            cs = dict(self._CORPUS)[cid]
            assert ov == len(set(qs) & set(cs))

    def test_overlap_threshold_unreachable_short_query(self, spark):
        from web_scrapper_spark.operators.setjoin import set_overlap_join

        q, c = self._dfs(spark)
        rows = set_overlap_join(q, c, min_overlap=3).collect()
        # only query sets with >= 3 distinct tokens can qualify; none
        # here share 3 tokens with any doc except none at all
        assert rows == []

    def test_duplicate_tokens_in_sets_are_harmless(self, spark):
        from web_scrapper_spark.operators.setjoin import (
            set_containment_join,
            set_overlap_join,
        )

        q = spark.createDataFrame(
            [(1, ["a", "a", "b"])], "query_id long, tokens array<string>"
        )
        c = spark.createDataFrame(
            [(7, ["b", "a", "b"])], "doc_id long, tokens array<string>"
        )
        assert set_containment_join(q, c).count() == 1
        r = set_overlap_join(q, c, min_overlap=2).collect()[0]
        assert r["overlap"] == 2

    def test_randomized_brute_force_parity(self, spark):
        import random

        from web_scrapper_spark.operators.setjoin import (
            set_containment_join,
            set_overlap_join,
        )

        rng = random.Random(42)
        vocab = [f"t{i}" for i in range(20)]
        corpus = [
            (i, sorted(rng.sample(vocab, rng.randint(0, 8))))
            for i in range(60)
        ]
        queries = [
            (100 + i, sorted(rng.sample(vocab, rng.randint(1, 4))))
            for i in range(15)
        ]
        cdf = spark.createDataFrame(corpus, "doc_id long, tokens array<string>")
        qdf = spark.createDataFrame(queries, "query_id long, tokens array<string>")
        got_c = {
            (r["query_id"], r["doc_id"])
            for r in set_containment_join(qdf, cdf).collect()
        }
        assert got_c == self._brute(queries, corpus, lambda a, b: a <= b)
        got_o = {
            (r["query_id"], r["doc_id"])
            for r in set_overlap_join(qdf, cdf, min_overlap=2).collect()
        }
        assert got_o == self._brute(
            queries, corpus, lambda a, b: len(a & b) >= 2
        )


class TestScriptProfile:
    """Unicode-script character profiling (textops.script_profile)."""

    def _run(self, spark, rows):
        return {
            r["doc_id"]: r
            for r in tx.script_profile(
                spark.createDataFrame(rows, "doc_id long, text string")
            ).collect()
        }

    def test_dominant_scripts(self, spark):
        out = self._run(
            spark,
            [
                (1, "hello world"),
                (2, "привет мир"),
                (3, "γειά σου κόσμε"),
                (4, "漢字かなカナ"),
                (5, "한글 테스트"),
            ],
        )
        assert out[1]["script_pred"] == "latin"
        assert out[2]["script_pred"] == "cyrillic"
        assert out[3]["script_pred"] == "greek"
        assert out[4]["script_pred"] == "cjk"
        assert out[5]["script_pred"] == "cjk"  # Hangul in the CJK range

    def test_homoglyph_mix_signal(self, spark):
        # 'а'/'е' below are Cyrillic spliced into Latin words
        out = self._run(
            spark, [(1, "paypаl sеcure"), (2, "paypal secure")]
        )
        assert out[1]["n_cyrillic"] == 2
        assert out[1]["script_pred"] == "latin"
        assert out[1]["mix_ppm"] > 0
        assert out[2]["mix_ppm"] == 0

    def test_counts_match_python(self, spark):
        text = "abc привет 漢字 123 !!!"
        out = self._run(spark, [(1, text)])
        assert out[1]["n_latin"] == 3
        assert out[1]["n_cyrillic"] == 6
        assert out[1]["n_cjk"] == 2
        assert out[1]["n_chars"] == len(text)

    def test_empty_and_unscripted(self, spark):
        out = self._run(spark, [(1, ""), (2, "12345 --- !!!"), (3, None)])
        for i in (1, 2, 3):
            assert out[i]["script_pred"] == "none"
            assert out[i]["mix_ppm"] == 0


class TestKcore:
    """k-core degree peeling (graph.kcore)."""

    @staticmethod
    def _python_kcore(edges, k):
        und = set()
        for a, b in edges:
            if a != b:
                und.add((a, b))
                und.add((b, a))
        while True:
            deg = {}
            for a, _ in und:
                deg[a] = deg.get(a, 0) + 1
            keep = {n for n, dg in deg.items() if dg >= k}
            nxt = {(a, b) for a, b in und if a in keep and b in keep}
            if nxt == und:
                break
            und = nxt
        deg = {}
        for a, _ in und:
            deg[a] = deg.get(a, 0) + 1
        return {n: dg for n, dg in deg.items() if dg >= k}

    def _run(self, spark, edges, k, **kw):
        from web_scrapper_spark.operators.graph import kcore

        df = spark.createDataFrame(edges, "src string, dst string")
        return {
            r["node"]: r["degree"] for r in kcore(df, k, **kw).collect()
        }

    def test_matches_python_peeling(self, spark):
        # K4 core + two pendant chains + a bridge node
        edges = [
            ("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"),
            ("b", "d"), ("c", "d"),
            ("d", "x"), ("x", "y"), ("y", "z"),
            ("a", "w"), ("w", "x"),
        ]
        for k in (1, 2, 3):
            assert self._run(spark, edges, k) == self._python_kcore(
                edges, k
            ), k

    def test_multi_round_cascade(self, spark):
        # bridge node attaches to the triangle with degree 2: survives
        # k=2 round 1 only while its chain neighbor lives -> the peel
        # must cascade across rounds
        edges = [
            ("a", "b"), ("b", "c"), ("c", "a"),
            ("c", "m"), ("m", "n"),
        ]
        out = self._run(spark, edges, 2)
        assert out == {"a": 2, "b": 2, "c": 2}

    def test_empty_core(self, spark):
        edges = [("a", "b"), ("b", "c")]
        assert self._run(spark, edges, 3) == {}

    def test_duplicate_and_self_edges_collapse(self, spark):
        edges = [
            ("a", "b"), ("b", "a"), ("a", "b"), ("a", "a"),
            ("b", "c"), ("c", "a"),
        ]
        assert self._run(spark, edges, 2) == {"a": 2, "b": 2, "c": 2}

    def test_partitioning_independence(self, spark):
        from web_scrapper_spark.operators.graph import kcore

        edges = [("n%d" % i, "n%d" % ((i * 3 + 1) % 20)) for i in range(200)]
        df = spark.createDataFrame(edges, "src string, dst string")
        a = sorted(map(tuple, kcore(df, 3).collect()))
        b = sorted(map(tuple, kcore(df.repartition(13), 3).collect()))
        assert a == b and a == sorted(
            self._python_kcore(edges, 3).items()
        )

    def test_bad_k(self, spark):
        import pytest as _pytest

        from web_scrapper_spark.operators.graph import kcore

        with _pytest.raises(ValueError):
            kcore(
                spark.createDataFrame([("a", "b")], "src string, dst string"),
                0,
            )


class TestPostingsGaps:
    """Gap encoding / decoding of posting blocks (textops.delta_*)."""

    def _idx(self, spark, n_docs=40, block=8):
        from web_scrapper_spark.operators.textops import build_postings

        rows = [
            (i * 3 + (i % 2), "common word%d" % (i % 5)) for i in range(n_docs)
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        return build_postings(docs, n_docs, block_size=block)

    def test_gaps_match_python_diff(self, spark):
        from web_scrapper_spark.operators.textops import (
            delta_encode_postings,
        )

        idx = self._idx(spark)
        raw = {
            (r["term"], r["block"]): list(r["doc_ids"])
            for r in idx.collect()
        }
        enc = delta_encode_postings(idx)
        for r in enc.collect():
            ids = raw[(r["term"], r["block"])]
            want = [ids[0]] + [b - a for a, b in zip(ids, ids[1:])]
            assert list(r["doc_gaps"]) == want
            assert r["first_doc"] == ids[0]

    def test_roundtrip_inverse(self, spark):
        from web_scrapper_spark.operators.textops import (
            delta_decode_postings,
            delta_encode_postings,
        )

        idx = self._idx(spark)
        dec = delta_decode_postings(delta_encode_postings(idx))
        a = sorted(
            (r["term"], r["block"], tuple(r["doc_ids"]), tuple(r["tfs"]))
            for r in idx.collect()
        )
        b = sorted(
            (r["term"], r["block"], tuple(r["doc_ids"]), tuple(r["tfs"]))
            for r in dec.collect()
        )
        assert a == b and len(a) > 0

    def test_requires_postings_shape(self, spark):
        import pytest as _pytest

        from web_scrapper_spark.operators.textops import (
            delta_encode_postings,
        )

        df = spark.createDataFrame([(1,)], "x long")
        with _pytest.raises(ValueError):
            delta_encode_postings(df)


class TestBm25fSearch:
    """Fielded BM25F over body + anchor text (textops.bm25f_search)."""

    DOCS = [
        (1, "apple pie recipe with apple"),
        (2, "banana bread recipe"),
        (3, "car engine manual"),
    ]
    # doc 3's body never says 'apple', but the web does
    ANCHORS = [
        (3, "apple apple apple"),
        (3, "best apple site"),
        (2, "banana"),
        (99, "apple"),  # dangling target -> dropped
    ]

    def _frames(self, spark):
        docs = spark.createDataFrame(self.DOCS, "doc_id long, text string")
        anchors = spark.createDataFrame(
            self.ANCHORS, "doc_id long, text string"
        )
        return docs, anchors

    @staticmethod
    def _python_bm25f(docs, anchors, qterms, wb, wa):
        import math
        import re

        tok = lambda s: [w for w in re.split(r"[^a-z0-9_]+", s.lower()) if w]
        body = {i: tok(t) for i, t in docs}
        anch: dict = {}
        for i, t in anchors:
            if i in body:
                anch.setdefault(i, []).extend(tok(t))
        dlf = {
            i: wb * len(body[i]) + wa * len(anch.get(i, []))
            for i in body
        }
        n, t_tok = len(body), sum(dlf.values())
        out: dict = {}
        for term in dict.fromkeys(qterms):
            tfp = {
                i: wb * body[i].count(term)
                + wa * anch.get(i, []).count(term)
                for i in body
            }
            df = sum(1 for v in tfp.values() if v > 0)
            if df == 0:
                continue
            idf = math.floor(
                math.log(float(2 * (n + 1)) / (2 * df + 1)) * 1_000_000
                + 0.5
            )
            for i, v in tfp.items():
                if v > 0:
                    s = (idf * 44 * v * t_tok) // (
                        20 * v * t_tok + 6 * t_tok + 18 * dlf[i] * n
                    )
                    a, c = out.get(i, (0, 0))
                    out[i] = (a + s, c + 1)
        return out

    def test_matches_python_replay(self, spark):
        from web_scrapper_spark.operators.textops import bm25f_search

        docs, anchors = self._frames(spark)
        qdf = spark.createDataFrame(
            [(1, "apple recipe")], "query_id long, text string"
        )
        got = {
            r["doc_id"]: (r["score_u"], r["n_terms"])
            for r in bm25f_search(
                docs, anchors, qdf, w_body=1, w_anchor=3
            ).collect()
        }
        want = self._python_bm25f(
            self.DOCS, self.ANCHORS, ["apple", "recipe"], 1, 3
        )
        assert got == want

    def test_anchor_field_changes_ranking(self, spark):
        from web_scrapper_spark.operators.textops import bm25f_search

        docs, anchors = self._frames(spark)
        qdf = spark.createDataFrame(
            [(1, "apple")], "query_id long, text string"
        )

        def top(wa):
            rows = bm25f_search(
                docs, anchors, qdf, w_body=1, w_anchor=wa
            ).collect()
            return min(rows, key=lambda r: r["rank"])["doc_id"]

        # body-only: doc 1 wins; anchor-heavy: the web's vote (doc 3)
        assert top(0) == 1
        assert top(10) == 3

    def test_docs_without_anchors_still_rank(self, spark):
        from web_scrapper_spark.operators.textops import bm25f_search

        docs, _ = self._frames(spark)
        empty = spark.createDataFrame([], "doc_id long, text string")
        qdf = spark.createDataFrame(
            [(1, "recipe")], "query_id long, text string"
        )
        out = bm25f_search(docs, empty, qdf).collect()
        assert {r["doc_id"] for r in out} == {1, 2}

    def test_weight_guard(self, spark):
        import pytest as _pytest

        from web_scrapper_spark.operators.textops import bm25f_search

        docs, anchors = self._frames(spark)
        qdf = spark.createDataFrame(
            [(1, "apple")], "query_id long, text string"
        )
        with _pytest.raises(ValueError):
            bm25f_search(docs, anchors, qdf, w_body=0, w_anchor=0)


class TestRetrievalMetrics:
    """TREC-style eval in exact integers (textops.retrieval_metrics)."""

    def _eval(self, spark, run_rows, qrel_rows, k=3):
        from web_scrapper_spark.operators.textops import retrieval_metrics

        run = spark.createDataFrame(
            run_rows, "query_id long, doc_id long, rank int"
        )
        qrels = spark.createDataFrame(
            qrel_rows, "query_id long, doc_id long, rel long"
        )
        return {
            r["query_id"]: r
            for r in retrieval_metrics(run, qrels, k=k).collect()
        }

    def test_hand_computed_ndcg_mrr_recall(self, spark):
        from web_scrapper_spark.operators.textops import _dcg_discounts_u

        w = _dcg_discounts_u(3)  # [1000000, 630930, 500000]
        out = self._eval(
            spark,
            [(1, 10, 1), (1, 11, 2), (1, 12, 3)],
            [(1, 11, 2), (1, 12, 1), (1, 99, 1)],
        )[1]
        dcg = 2 * w[1] + 1 * w[2]
        idcg = 2 * w[0] + 1 * w[1] + 1 * w[2]
        assert out["dcg_u"] == dcg and out["idcg_u"] == idcg
        assert out["ndcg_ppm"] == dcg * 1_000_000 // idcg
        assert out["rr_ppm"] == 500_000  # first hit at rank 2
        assert out["hits"] == 2 and out["n_rel"] == 3
        assert out["recall_ppm"] == 2 * 1_000_000 // 3

    def test_nothing_relevant_retrieved(self, spark):
        out = self._eval(
            spark, [(1, 10, 1), (1, 11, 2)], [(1, 99, 2)]
        )[1]
        assert out["dcg_u"] == 0 and out["ndcg_ppm"] == 0
        assert out["rr_ppm"] == 0
        assert out["recall_ppm"] == 0 and out["n_rel"] == 1

    def test_query_without_judgments(self, spark):
        out = self._eval(spark, [(2, 5, 1)], [(1, 5, 1)])
        assert out[2]["idcg_u"] == 0 and out[2]["ndcg_ppm"] == 0
        assert out[2]["n_rel"] == 0 and out[2]["recall_ppm"] == 0

    def test_ideal_truncates_at_k(self, spark):
        from web_scrapper_spark.operators.textops import _dcg_discounts_u

        w = _dcg_discounts_u(2)
        # 3 positives but k=2: idcg uses only the best two
        out = self._eval(
            spark,
            [(1, 10, 1), (1, 11, 2)],
            [(1, 10, 1), (1, 11, 2), (1, 12, 2)],
            k=2,
        )[1]
        assert out["idcg_u"] == 2 * w[0] + 2 * w[1]

    def test_bad_k(self, spark):
        import pytest as _pytest

        from web_scrapper_spark.operators.textops import retrieval_metrics

        run = spark.createDataFrame([], "query_id long, doc_id long, rank int")
        with _pytest.raises(ValueError):
            retrieval_metrics(run, run, k=0)


class TestUrlEquivalence:
    """URL equivalence classes (graph.url_equivalence_classes)."""

    def _run(self, spark, edges):
        from web_scrapper_spark.operators.graph import (
            url_equivalence_classes,
        )

        df = spark.createDataFrame(edges, "src_url string, dst_url string")
        return {
            r["url"]: (r["canonical_url"], r["cluster_size"])
            for r in url_equivalence_classes(df).collect()
        }

    def test_redirect_and_canonical_fold_into_one_class(self, spark):
        out = self._run(
            spark,
            [
                ("http://a/r1", "http://a/r2"),
                ("http://a/r2", "http://a/final"),
                ("http://a/final?utm=x", "http://a/final"),
                ("http://b/x", "http://b/y"),
            ],
        )
        # the whole redirect+canonical family shares one identity
        fam = {"http://a/r1", "http://a/r2", "http://a/final",
               "http://a/final?utm=x"}
        canon = {out[u][0] for u in fam}
        assert canon == {"http://a/final"}  # lexicographic min
        assert all(out[u][1] == 4 for u in fam)
        assert out["http://b/x"] == ("http://b/x", 2)

    def test_partitioning_independence(self, spark):
        from web_scrapper_spark.operators.graph import (
            url_equivalence_classes,
        )

        edges = [
            (f"http://h/{i}", f"http://h/{(i * 3 + 1) % 40}")
            for i in range(120)
        ]
        df = spark.createDataFrame(edges, "src_url string, dst_url string")
        a = sorted(map(tuple, url_equivalence_classes(df).collect()))
        b = sorted(
            map(tuple, url_equivalence_classes(df.repartition(9)).collect())
        )
        assert a == b


class TestMoreLikeThis:
    """Lucene-style MLT (textops.more_like_this)."""

    DOCS = [
        (1, "quantum entanglement physics experiment quantum"),
        (2, "quantum physics entanglement laboratory notes"),
        (3, "banana bread baking recipe flour"),
        (4, "baking flour bread oven recipe"),
        (5, "entanglement quantum decoherence physics"),
    ]

    def _docs(self, spark):
        return spark.createDataFrame(self.DOCS, "doc_id long, text string")

    def test_finds_vocabulary_neighbors(self, spark):
        from web_scrapper_spark.operators.textops import more_like_this

        out = more_like_this(self._docs(spark), [1], k=2, m_terms=3).collect()
        ids = [r["doc_id"] for r in sorted(out, key=lambda r: r["rank"])]
        # the physics docs, never the baking docs
        assert set(ids) <= {2, 5} and len(ids) == 2

    def test_self_excluded_and_ranks_dense(self, spark):
        from web_scrapper_spark.operators.textops import more_like_this

        out = more_like_this(
            self._docs(spark), [1, 3], k=4, m_terms=3
        ).collect()
        for r in out:
            assert r["doc_id"] != r["query_id"]
        by_q: dict = {}
        for r in out:
            by_q.setdefault(r["query_id"], []).append(r["rank"])
        for ranks in by_q.values():
            assert sorted(ranks) == list(range(1, len(ranks) + 1))

    def test_empty_sources_raise(self, spark):
        import pytest as _pytest

        from web_scrapper_spark.operators.textops import more_like_this

        with _pytest.raises(ValueError):
            more_like_this(self._docs(spark), [], k=2)
        with _pytest.raises(ValueError, match="docs= or index="):
            more_like_this(None, [1], k=2)

    def test_term_weights_from_postings_parity(self, spark):
        # the from-index derivation is EXACT: same (doc, word, tf, df,
        # dl, score_u) rows as the from-text build, because the
        # keyword vocabulary is a pure filter of the index tokenizer
        from web_scrapper_spark.operators.textops import (
            bm25_term_weights,
            bm25_term_weights_from_postings,
            build_postings,
        )

        docs = self._docs(spark)
        from_text = bm25_term_weights(docs).collect()
        idx = build_postings(docs, n_docs=len(self.DOCS), include_dls=True)
        from_idx = bm25_term_weights_from_postings(idx).collect()

        def canon(rows):
            return sorted(
                (r["doc_id"], r["word"], r["tf"], r["df"], r["dl"],
                 r["score_u"])
                for r in rows
            )

        assert canon(from_idx) == canon(from_text)
        # ranked variant agrees too
        rt = bm25_term_weights(docs, k=2).collect()
        ri = bm25_term_weights_from_postings(idx, k=2).collect()
        assert canon(rt) == canon(ri)

    def test_from_index_equals_self_built(self, spark):
        # the interactive path: MLT against a prebuilt index returns
        # the identical result — no corpus re-tokenization (plan-
        # pinned: no Python stage, no text read in the query plan)
        from web_scrapper_spark.operators.textops import (
            build_postings,
            doc_lengths,
            more_like_this,
        )

        docs = self._docs(spark)
        dls = doc_lengths(docs)
        n = len(self.DOCS)
        t = sum(r["dl"] for r in dls.collect())
        idx = {
            "postings": build_postings(
                docs, n_docs=n, include_dls=True
            ).localCheckpoint(eager=True),
            "doc_lens": dls,
            "n_docs": n,
            "t_tokens": t,
        }
        self_built = more_like_this(docs, [1, 3], k=3, m_terms=3)
        from_idx = more_like_this(None, [1, 3], k=3, m_terms=3, index=idx)

        def canon(df):
            return sorted(map(tuple, df.collect()))

        assert canon(from_idx) == canon(self_built)

        # zero re-tokenization: the from-index plan never reads text
        import contextlib
        import io

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            from_idx.explain("formatted")
        plan = buf.getvalue()
        assert "MapInPandas" not in plan and "ArrowEvalPython" not in plan
        for line in plan.splitlines():
            if "ReadSchema" in line:
                assert "text" not in line and "html" not in line, line

    def test_prebuilt_term_weights_accepted(self, spark):
        # a persisted bm25_term_weights table (ranked or not) skips
        # even the postings-derivation for query formation
        from web_scrapper_spark.operators.textops import (
            bm25_term_weights,
            build_postings,
            doc_lengths,
            more_like_this,
        )

        docs = self._docs(spark)
        dls = doc_lengths(docs)
        n = len(self.DOCS)
        t = sum(r["dl"] for r in dls.collect())
        idx = {
            "postings": build_postings(docs, n_docs=n, include_dls=True),
            "doc_lens": dls,
            "n_docs": n,
            "t_tokens": t,
        }
        base = more_like_this(docs, [1], k=2, m_terms=3)
        for tw in (
            bm25_term_weights(docs),          # unranked
            bm25_term_weights(docs, k=3),     # ranked with k == m_terms
        ):
            got = more_like_this(
                None, [1], k=2, m_terms=3, index=idx, term_weights=tw
            )
            assert sorted(map(tuple, got.collect())) == sorted(
                map(tuple, base.collect())
            )

    def test_df_gated_from_index_equals_from_text(self, spark):
        """Regression (round-5 advice): df-gated MLT against a prebuilt
        index must match the self-build path — query weights ALWAYS
        ungated (Lucene semantics), gates applied only to the search
        side via search_postings (ungated index + merge-contract view).
        Deriving query weights from gated postings diverges: gates that
        elide a doc's distinctive terms change the query itself."""
        from web_scrapper_spark.operators.textops import (
            build_postings,
            doc_lengths,
            merge_postings,
            more_like_this,
        )

        docs = self._docs(spark)
        dls = doc_lengths(docs)
        n = len(self.DOCS)
        t = sum(r["dl"] for r in dls.collect())
        # max_df 3/5 docs -> 'quantum'/'physics'/'entanglement' (df=3)
        # are elided from the SEARCH index but stay query-formable
        gates = dict(min_df=2, max_df_ppm=550_000)
        ungated = build_postings(
            docs, n_docs=n, include_dls=True
        ).localCheckpoint(eager=True)
        idx = {"postings": ungated, "doc_lens": dls,
               "n_docs": n, "t_tokens": t}
        from_text = more_like_this(docs, [1, 3], k=3, m_terms=3, **gates)
        from_idx = more_like_this(
            None, [1, 3], k=3, m_terms=3, index=idx,
            search_postings=merge_postings([ungated], n_docs=n, **gates),
        )
        assert sorted(map(tuple, from_idx.collect())) == sorted(
            map(tuple, from_text.collect())
        )
        # the gates are NOT a no-op on this fixture: gated differs from
        # ungated (otherwise this parity test would be vacuous)
        ungated_res = more_like_this(docs, [1, 3], k=3, m_terms=3)
        assert sorted(map(tuple, from_text.collect())) != sorted(
            map(tuple, ungated_res.collect())
        )
        with pytest.raises(ValueError, match="requires index"):
            more_like_this(docs, [1], search_postings=ungated)


class TestMergePostings:
    """Incremental index merge (textops.merge_postings)."""

    def test_merge_equals_batch(self, spark):
        from web_scrapper_spark.operators.textops import (
            build_postings,
            merge_postings,
        )

        rows = [(i, "w%d common shared" % (i % 4)) for i in range(20)]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        a = docs.filter("doc_id < 7")
        b = docs.filter("doc_id >= 7")
        merged = merge_postings(
            [
                build_postings(a, 20, block_size=4, include_dls=True),
                build_postings(b, 20, block_size=4, include_dls=True),
            ],
            min_df=2, max_df_ppm=900_000, n_docs=20, block_size=4,
        )
        batch = build_postings(
            docs, 20, min_df=2, max_df_ppm=900_000, block_size=4,
            include_dls=True,
        )
        key = lambda r: (  # noqa: E731
            r["term"], r["block"], tuple(r["doc_ids"]), tuple(r["tfs"]),
            tuple(r["dls"]), r["df"],
        )
        assert sorted(map(key, merged.collect())) == sorted(
            map(key, batch.collect())
        )

    def test_cross_shard_min_df_terms_survive(self, spark):
        """A term appearing ONCE per shard fails a shard-local min_df=2
        gate but must pass the merge-time global gate — the reason
        shards stay ungated."""
        from web_scrapper_spark.operators.textops import (
            build_postings,
            merge_postings,
        )

        a = spark.createDataFrame([(1, "rare filler")], "doc_id long, text string")
        b = spark.createDataFrame([(2, "rare other")], "doc_id long, text string")
        merged = merge_postings(
            [build_postings(a, 2), build_postings(b, 2)],
            min_df=2, n_docs=2,
        )
        out = {r["term"]: list(r["doc_ids"]) for r in merged.collect()}
        assert out == {"rare": [1, 2]}

    def test_guards(self, spark):
        import pytest as _pytest

        from web_scrapper_spark.operators.textops import (
            build_postings,
            merge_postings,
        )

        docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
        idx = build_postings(docs, 1)
        with _pytest.raises(ValueError):
            merge_postings([], n_docs=1)
        with _pytest.raises(ValueError):
            merge_postings([idx], n_docs=0)


class TestHostMoves:
    """Site-migration detection (graph.host_moves)."""

    def _run(self, spark, rows, **kw):
        from web_scrapper_spark.operators.graph import host_moves

        df = spark.createDataFrame(rows, "src_url string, dst_url string")
        return {r["host"]: r for r in host_moves(df, **kw).collect()}

    def test_mass_move_detected_scatter_not(self, spark):
        rows = (
            [("http://old.com/p%d" % i, "https://new.com/p%d" % i)
             for i in range(8)]
            + [("http://old.com/x", "http://cdn.com/x")]
            + [("http://sc.com/%d" % i, "http://z%d.com/" % i)
               for i in range(6)]
        )
        out = self._run(spark, rows)
        assert out["old.com"]["moved"] is True
        assert out["old.com"]["dst_host"] == "new.com"
        assert out["old.com"]["share_ppm"] == 8 * 1_000_000 // 9
        assert out["sc.com"]["moved"] is False

    def test_same_host_and_case_and_userinfo(self, spark):
        rows = [
            ("HTTP://u:p@Old.COM/a", "https://NEW.com/a"),
            ("http://old.com/b", "https://new.com/b"),
            ("http://old.com/c", "HTTPS://old.com/c2"),  # same host: out
        ]
        out = self._run(spark, rows, min_pages=2)
        assert out["old.com"]["n_pages"] == 2
        assert out["old.com"]["dst_host"] == "new.com"
        assert out["old.com"]["moved"] is True

    def test_tie_breaks_to_smallest_host(self, spark):
        rows = [
            ("http://t.com/1", "http://bbb.com/"),
            ("http://t.com/2", "http://aaa.com/"),
        ]
        out = self._run(spark, rows, min_pages=1, min_share_ppm=1)
        assert out["t.com"]["dst_host"] == "aaa.com"
        assert out["t.com"]["n_to_dst"] == 1

    def test_default_ports_fold_into_host(self, spark):
        # :80/:443 are the same host (surt discipline): the http->https
        # migration with explicit ports is SAME-host (excluded), and
        # explicit-port aliases must not split one host's evidence
        rows = [
            # same host modulo default ports -> excluded entirely
            ("http://e.com:80/a", "https://e.com:443/a"),
            # old.com evidence split across :80 / portless must merge
            ("http://old.com:80/1", "https://new.com/1"),
            ("http://old.com/2", "https://new.com:443/2"),
            ("http://old.com/3", "https://new.com/3"),
        ]
        out = self._run(spark, rows, min_pages=3)
        assert "e.com" not in out
        assert out["old.com"]["n_pages"] == 3
        assert out["old.com"]["dst_host"] == "new.com"
        assert out["old.com"]["moved"] is True

    def test_non_default_port_kept_distinct(self, spark):
        rows = [
            ("http://p.com:8080/1", "http://q.com/1"),
            ("http://p.com:8080/2", "http://q.com/2"),
        ]
        out = self._run(spark, rows, min_pages=1, min_share_ppm=1)
        assert "p.com:8080" in out and "p.com" not in out

    def test_scheme_mismatched_default_port_kept(self, spark):
        # Review fix (round 4): only the SCHEME-MATCHED default folds.
        # https://h:80 and http://h:443 are real non-default endpoints
        # (different origins) — blanket :80/:443 stripping conflated
        # them with the portless host
        rows = [
            ("https://p.com:80/1", "http://q.com:443/1"),
            ("https://p.com:80/2", "http://q.com:443/2"),
            # the matched defaults still fold (case-insensitive scheme)
            ("HTTP://p.com:80/3", "HTTPS://r.com:443/3"),
        ]
        out = self._run(spark, rows, min_pages=1, min_share_ppm=1)
        assert "p.com:80" in out and out["p.com:80"]["dst_host"] == "q.com:443"
        assert "p.com" in out and out["p.com"]["dst_host"] == "r.com"


class TestPositionalPostings:
    """Positional inverted index (textops.build_positional_postings)."""

    def _docs(self, spark, rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_offsets_sorted_and_aligned_with_tf(self, spark):
        from web_scrapper_spark.operators.textops import (
            build_positional_postings,
        )

        rows = [(1, "alpha beta alpha"), (2, "beta alpha"), (3, "beta")]
        out = {
            (r["term"], r["block"]): r
            for r in build_positional_postings(
                self._docs(spark, rows), 3
            ).collect()
        }
        a = out[("alpha", 0)]
        assert list(a["doc_ids"]) == [1, 2]
        assert [list(p) for p in a["position_lists"]] == [[0, 2], [1]]
        assert list(a["tfs"]) == [2, 1]
        b = out[("beta", 0)]
        assert [list(p) for p in b["position_lists"]] == [[1], [0], [0]]
        # invariant: size(position_lists[i]) == tfs[i]
        for r in out.values():
            assert [len(p) for p in r["position_lists"]] == list(r["tfs"])

    def test_blocking_carries_positions(self, spark):
        from web_scrapper_spark.operators.textops import (
            build_positional_postings,
        )

        rows = [(i, "x x x") for i in range(5)]
        out = sorted(
            build_positional_postings(
                self._docs(spark, rows), 5, block_size=2
            ).collect(),
            key=lambda r: r["block"],
        )
        assert [r["block"] for r in out] == [0, 1, 2]
        assert all(
            [list(p) for p in r["position_lists"]]
            == [[0, 1, 2]] * len(r["doc_ids"])
            for r in out
        )

    def test_df_gates_match_plain_postings(self, spark):
        from web_scrapper_spark.operators.textops import (
            build_positional_postings,
            build_postings,
        )

        rows = [(i, "the unique%d word extra" % i) for i in range(10)]
        docs = self._docs(spark, rows)
        plain = build_postings(docs, 10, min_df=2, max_df_ppm=900_000)
        positional = build_positional_postings(
            docs, 10, min_df=2, max_df_ppm=900_000
        )
        assert {r["term"] for r in plain.collect()} == {
            r["term"] for r in positional.collect()
        }


class TestPhraseSearch:
    """Exact phrase query (textops.phrase_search)."""

    def _docs(self, spark, rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_consecutive_run_required(self, spark):
        from web_scrapper_spark.operators.textops import phrase_search

        rows = [
            (1, "big data big data systems"),
            (2, "big systems data"),       # terms present, not adjacent
            (3, "data big"),               # wrong order
        ]
        out = phrase_search(self._docs(spark, rows), "big data", k=10).collect()
        assert [(r["doc_id"], r["phrase_tf"], r["first_pos"]) for r in out] == [
            (1, 2, 0)
        ]

    def test_duplicate_phrase_terms(self, spark):
        from web_scrapper_spark.operators.textops import phrase_search

        rows = [(1, "go go go stop"), (2, "go stop go")]
        out = phrase_search(self._docs(spark, rows), "go go", k=10).collect()
        # doc1: runs at 0 and 1 (overlapping counts twice); doc2: none
        assert [(r["doc_id"], r["phrase_tf"]) for r in out] == [(1, 2)]

    def test_ranking_and_k(self, spark):
        from web_scrapper_spark.operators.textops import phrase_search

        rows = [
            (1, "a b"), (2, "a b a b"), (3, "a b a b a b"), (4, "b a"),
        ]
        out = phrase_search(self._docs(spark, rows), "a b", k=2).collect()
        assert [(r["doc_id"], r["phrase_tf"]) for r in out] == [(3, 3), (2, 2)]

    def test_index_path_equals_docs_path(self, spark):
        from web_scrapper_spark.operators.textops import (
            build_positional_postings,
            phrase_search,
        )

        rows = [
            (1, "red fish blue fish"),
            (2, "blue fish red fish blue fish"),
            (3, "fish red blue"),
        ]
        docs = self._docs(spark, rows)
        idx = build_positional_postings(docs, 3, block_size=2)
        from_docs = phrase_search(docs, "blue fish", k=10).collect()
        from_idx = phrase_search(phrase="blue fish", index=idx, k=10).collect()
        assert [tuple(r) for r in from_docs] == [tuple(r) for r in from_idx]
        assert [(r["doc_id"], r["phrase_tf"]) for r in from_docs] == [
            (2, 2), (1, 1)
        ]

    def test_single_term_phrase_and_null_text(self, spark):
        from web_scrapper_spark.operators.textops import phrase_search

        rows = [(1, "solo act"), (2, None), (3, "")]
        out = phrase_search(self._docs(spark, rows), "solo", k=10).collect()
        assert [(r["doc_id"], r["phrase_tf"], r["first_pos"]) for r in out] == [
            (1, 1, 0)
        ]

    def test_contract_errors(self, spark):
        import pytest as _pytest

        from web_scrapper_spark.operators.textops import phrase_search

        docs = self._docs(spark, [(1, "x")])
        with _pytest.raises(ValueError):
            phrase_search(docs, "   !!!   ")           # no tokens
        with _pytest.raises(ValueError):
            phrase_search(docs, "x", index=docs)       # both sources
        with _pytest.raises(ValueError):
            phrase_search(phrase="x")                  # neither source


class TestSnippetExtract:
    """Best-fragment snippets (textops.snippet_extract)."""

    def _docs(self, spark, rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_densest_window_wins(self, spark):
        from web_scrapper_spark.operators.textops import snippet_extract

        rows = [(1, "alpha x x x x x x x x alpha beta gamma tail")]
        out = snippet_extract(
            self._docs(spark, rows), "alpha beta gamma", window=4
        ).collect()
        assert len(out) == 1
        r = out[0]
        # window at 9 covers alpha,beta,gamma (3 distinct) vs 1 at 0
        assert (r["start"], r["n_terms"]) == (9, 3)
        assert r["snippet"] == "alpha beta gamma tail"

    def test_tie_breaks_earliest(self, spark):
        from web_scrapper_spark.operators.textops import snippet_extract

        rows = [(1, "key a a a a a a a a key")]
        out = snippet_extract(self._docs(spark, rows), "key", window=3).collect()
        assert (out[0]["start"], out[0]["n_terms"]) == (0, 1)
        assert out[0]["snippet"] == "key a a"

    def test_window_clips_at_doc_end(self, spark):
        from web_scrapper_spark.operators.textops import snippet_extract

        rows = [(1, "pad pad target")]
        out = snippet_extract(self._docs(spark, rows), "target", window=5).collect()
        assert out[0]["snippet"] == "target"

    def test_non_matching_docs_absent(self, spark):
        from web_scrapper_spark.operators.textops import snippet_extract

        rows = [(1, "hit here"), (2, "nothing relevant"), (3, None)]
        out = snippet_extract(self._docs(spark, rows), "hit", window=2).collect()
        assert [r["doc_id"] for r in out] == [1]

    def test_query_tokenized_like_corpus(self, spark):
        from web_scrapper_spark.operators.textops import snippet_extract

        # query tokenizer lowers + splits on non-word, same as corpus
        rows = [(1, "mixed case token stream")]
        out = snippet_extract(
            self._docs(spark, rows), "  MIXED, Token!  ", window=3
        ).collect()
        assert (out[0]["start"], out[0]["n_terms"]) == (0, 2)

    def test_contract_errors(self, spark):
        import pytest as _pytest

        from web_scrapper_spark.operators.textops import snippet_extract

        docs = self._docs(spark, [(1, "x")])
        with _pytest.raises(ValueError):
            snippet_extract(docs, "...")
        with _pytest.raises(ValueError):
            snippet_extract(docs, "x", window=0)


class TestProximitySearch:
    """Unordered within-window co-occurrence (textops.proximity_search)."""

    def _docs(self, spark, rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_all_terms_must_fit_in_window(self, spark):
        from web_scrapper_spark.operators.textops import proximity_search

        rows = [
            (1, "cat x dog"),                    # within 3
            (2, "cat x x x x x x x x x dog"),    # 10 apart, outside 3
            (3, "dog only here"),
        ]
        out = proximity_search(
            self._docs(spark, rows), "cat dog", window=3, k=10
        ).collect()
        assert [(r["doc_id"], r["n_windows"], r["best_start"]) for r in out] \
            == [(1, 1, 0)]

    def test_order_does_not_matter_and_counting(self, spark):
        from web_scrapper_spark.operators.textops import proximity_search

        # every match offset whose span covers both terms counts
        rows = [(1, "dog cat dog"), (2, "cat dog")]
        out = proximity_search(
            self._docs(spark, rows), "cat dog", window=2, k=10
        ).collect()
        # doc1: start 0 (dog,cat) and start 1 (cat,dog) both cover
        assert [(r["doc_id"], r["n_windows"]) for r in out] == [(2, 1), (1, 2)][::-1]

    def test_ranking_k_and_guards(self, spark):
        import pytest as _pytest

        from web_scrapper_spark.operators.textops import proximity_search

        docs = self._docs(spark, [(1, "a b"), (2, "a b a b")])
        out = proximity_search(docs, "a b", window=2, k=1).collect()
        assert [(r["doc_id"], r["n_windows"]) for r in out] == [(2, 3)]
        with _pytest.raises(ValueError):
            proximity_search(docs, "  ")
        with _pytest.raises(ValueError):
            proximity_search(docs, "a", window=0)


class TestMergePositionalPostings:
    """Positional incremental index (textops.merge_positional_postings)."""

    def _docs(self, spark, rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_merge_equals_batch_with_norms_and_gates(self, spark):
        from web_scrapper_spark.operators.textops import (
            build_positional_postings,
            merge_positional_postings,
        )

        rows = [
            (i, "w%d common t%d w%d common" % (i % 3, i, (i + 1) % 3))
            for i in range(12)
        ]
        docs = self._docs(spark, rows)
        batch = build_positional_postings(
            docs, 12, block_size=3, include_dls=True,
            min_df=2, max_df_ppm=900_000,
        )
        a = build_positional_postings(
            docs.filter("doc_id % 2 = 0"), 6, block_size=3, include_dls=True
        )
        b = build_positional_postings(
            docs.filter("doc_id % 2 = 1"), 6, block_size=3, include_dls=True
        )
        merged = merge_positional_postings(
            [a, b], n_docs=12, block_size=3, min_df=2, max_df_ppm=900_000
        )

        def canon(df):
            return sorted(tuple(map(str, r)) for r in df.collect())

        assert canon(merged) == canon(batch)

    def test_positional_minus_positions_is_plain_build(self, spark):
        from web_scrapper_spark.operators.textops import (
            build_positional_postings,
            build_postings,
        )

        rows = [(i, "a b a c b" if i % 2 else "c a b") for i in range(8)]
        docs = self._docs(spark, rows)
        plain = build_postings(docs, 8, block_size=3, include_dls=True)
        derived = build_positional_postings(
            docs, 8, block_size=3, include_dls=True
        ).drop("position_lists")

        def canon(df):
            return sorted(tuple(map(str, r)) for r in df.collect())

        assert canon(derived) == canon(plain)

    def test_guards(self, spark):
        import pytest as _pytest

        from web_scrapper_spark.operators.textops import (
            build_positional_postings,
            merge_positional_postings,
        )

        docs = self._docs(spark, [(1, "x")])
        shard = build_positional_postings(docs, 1)
        with _pytest.raises(ValueError):
            merge_positional_postings([], n_docs=1)
        with _pytest.raises(ValueError):
            merge_positional_postings([shard], n_docs=0)


class TestBooleanSearch:
    """Boolean clause retrieval (textops.boolean_search)."""

    def _docs(self, spark, rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_clause_semantics(self, spark):
        from web_scrapper_spark.operators.textops import boolean_search

        rows = [
            (1, "cat dog bird"),        # must ok, 2 should
            (2, "cat dog"),             # must ok, 1 should
            (3, "dog bird"),            # missing must
            (4, "cat dog bird snake"),  # must_not hit
            (5, "cat"),                 # must ok, 0 should
        ]
        out = boolean_search(
            self._docs(spark, rows), must=("cat",),
            should=("dog", "bird"), must_not=("snake",), k=10,
        ).collect()
        assert [(r["doc_id"], r["n_should"]) for r in out] == [
            (1, 2), (2, 1), (5, 0)
        ]

    def test_pure_should_requires_one(self, spark):
        from web_scrapper_spark.operators.textops import boolean_search

        rows = [(1, "x y"), (2, "z")]
        out = boolean_search(
            self._docs(spark, rows), should=("x", "y"), k=10
        ).collect()
        assert [(r["doc_id"], r["n_should"]) for r in out] == [(1, 2)]

    def test_index_path_and_duplicate_tf_ignored(self, spark):
        from web_scrapper_spark.operators.textops import (
            boolean_search,
            build_postings,
        )

        rows = [(1, "cat cat cat dog"), (2, "cat dog dog")]
        docs = self._docs(spark, rows)
        idx = build_postings(docs, 2)
        from_docs = boolean_search(
            docs, must=("cat", "dog"), k=10
        ).collect()
        from_idx = boolean_search(
            index=idx, must=("cat", "dog"), k=10
        ).collect()
        # presence-based: tf never changes membership or score
        assert [tuple(r) for r in from_docs] == [tuple(r) for r in from_idx]
        assert [r["doc_id"] for r in from_docs] == [1, 2]

    def test_guards(self, spark):
        import pytest as _pytest

        from web_scrapper_spark.operators.textops import boolean_search

        docs = self._docs(spark, [(1, "x")])
        with _pytest.raises(ValueError):
            boolean_search(docs)                       # no terms
        with _pytest.raises(ValueError):
            boolean_search(docs, must=("two words",))  # multi-token
        with _pytest.raises(ValueError):
            boolean_search(docs, must=("x",), must_not=("x",))
        with _pytest.raises(ValueError):
            boolean_search(docs, must=("x",), index=docs)


class TestTermCooccurrence:
    """PMI-lift related terms (textops.term_cooccurrence)."""

    def _docs(self, spark, rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_window_band_and_lift_ranking(self, spark):
        from web_scrapper_spark.operators.textops import term_cooccurrence

        # 'near' always adjacent to seed; 'far' always outside the
        # window; 'common' everywhere (high cnt -> low lift)
        rows = [
            (i, "seed near common x x x x x x far common")
            for i in range(4)
        ]
        out = term_cooccurrence(
            self._docs(spark, rows), ["seed"], window=2, k=5, min_pairs=2
        ).collect()
        terms = [r["term"] for r in out]
        assert "near" in terms and "far" not in terms
        by = {r["term"]: r for r in out}
        assert by["near"]["pairs"] == 4
        # near (cnt 4) outranks common (cnt 8, only 1 in-window copy)
        assert by["near"]["lift_ppm"] > by["common"]["lift_ppm"]
        assert by["near"]["rank"] < by["common"]["rank"]

    def test_integer_lift_replay(self, spark):
        from web_scrapper_spark.operators.textops import term_cooccurrence

        rows = [(1, "a b a b"), (2, "a c")]
        out = term_cooccurrence(
            self._docs(spark, rows), ["a"], window=1, k=10, min_pairs=1
        ).collect()
        by = {r["term"]: r for r in out}
        # T=6; pairs(a,b): a@0-b@1, b@1-a@2, a@2-b@3 -> 3; cnt_a=3, cnt_b=2
        assert by["b"]["pairs"] == 3
        assert by["b"]["lift_ppm"] == 3 * 6 * 1_000_000 // (3 * 2)
        # self-pairs: a@0..a@2 not adjacent (|dp|=2 > 1) -> absent
        assert "a" not in by
        assert by["c"]["pairs"] == 1

    def test_min_pairs_and_guards(self, spark):
        import pytest as _pytest

        from web_scrapper_spark.operators.textops import term_cooccurrence

        docs = self._docs(spark, [(1, "a b")])
        out = term_cooccurrence(docs, ["a"], window=1, k=5, min_pairs=2)
        assert out.collect() == []
        with _pytest.raises(ValueError):
            term_cooccurrence(docs, [" "], window=1)
        with _pytest.raises(ValueError):
            term_cooccurrence(docs, ["a"], window=0)


class TestSpellCorrect:
    """SymSpell symmetric-deletion correction (textops.spell_correct)."""

    def _docs(self, spark, rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_ed1_complete_against_brute_force(self, spark):
        from web_scrapper_spark.operators.textops import (
            spell_correct,
            tokenize_query,
        )

        vocab_text = "table spark query window partition shuffle stage"
        rows = [(i, vocab_text) for i in range(2)]
        docs = self._docs(spark, rows)
        vocab = vocab_text.split()

        def lev(a, b):
            import functools

            @functools.lru_cache(None)
            def d(i, j):
                if not i:
                    return j
                if not j:
                    return i
                return min(
                    d(i - 1, j) + 1, d(i, j - 1) + 1,
                    d(i - 1, j - 1) + (a[i - 1] != b[j - 1]),
                )
            return d(len(a), len(b))

        queries = ["tble", "sparc", "windw", "stagee", "query", "zzz"]
        out = spell_correct(docs, queries, max_edit=1, k=10, min_count=1)
        got = {
            (r["query"], r["suggestion"], r["distance"])
            for r in out.collect()
        }
        want = {
            (q, v, lev(q, v))
            for q in queries for v in vocab if lev(q, v) <= 1
        }
        assert got == want

    def test_transposition_is_distance_two(self, spark):
        from web_scrapper_spark.operators.textops import spell_correct

        docs = self._docs(spark, [(1, "table table")])
        # plain Levenshtein (both engines' builtin): 'tabel' is 2 away
        assert spell_correct(
            docs, ["tabel"], max_edit=1, k=5, min_count=1
        ).collect() == []
        out = spell_correct(
            docs, ["tabel"], max_edit=2, k=5, min_count=1
        ).collect()
        assert [(r["suggestion"], r["distance"]) for r in out] == [
            ("table", 2)
        ]

    def test_popularity_prior_and_min_count(self, spark):
        from web_scrapper_spark.operators.textops import spell_correct

        docs = self._docs(
            spark, [(1, "cart cart cart care typo"), (2, "care cart")]
        )
        out = spell_correct(
            docs, ["carr"], max_edit=1, k=5, min_count=2
        ).collect()
        # cart (cnt 4) outranks care (cnt 2) at equal distance;
        # hapax 'typo' never suggestable at min_count=2
        assert [(r["suggestion"], r["rank"]) for r in out] == [
            ("cart", 1), ("care", 2)
        ]

    def test_guards(self, spark):
        import pytest as _pytest

        from web_scrapper_spark.operators.textops import spell_correct

        docs = self._docs(spark, [(1, "x")])
        with _pytest.raises(ValueError):
            spell_correct(docs, ["a"], max_edit=3)
        with _pytest.raises(ValueError):
            spell_correct(docs, ["two words"])
        with _pytest.raises(ValueError):
            spell_correct(docs, [])
        with _pytest.raises(ValueError):
            spell_correct(docs, ["a"], k=0)


class TestSpellCorrectFromIndex:
    def test_index_path_equals_docs_path(self, spark):
        from web_scrapper_spark.operators.textops import (
            build_postings,
            spell_correct,
        )

        rows = [(1, "alpha beta beta gamma"), (2, "beta gamma gamma")]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        idx = build_postings(docs, 2)
        qs = ["alpa", "betta", "gama"]
        a = spell_correct(docs, qs, max_edit=2, k=5, min_count=1)
        b = spell_correct(queries=qs, index=idx, max_edit=2, k=5,
                          min_count=1)
        ka = sorted(tuple(r) for r in a.collect())
        kb = sorted(tuple(r) for r in b.collect())
        assert ka == kb and ka

    def test_guard_both_sources(self, spark):
        import pytest as _pytest

        from web_scrapper_spark.operators.textops import spell_correct

        docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
        with _pytest.raises(ValueError):
            spell_correct(docs, ["a"], index=docs)
        with _pytest.raises(ValueError):
            spell_correct(queries=["a"])


class TestConcordance:
    """KWIC concordance (textops.concordance)."""

    def _docs(self, spark, rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_context_clipping_and_positions(self, spark):
        from web_scrapper_spark.operators.textops import concordance

        docs = self._docs(
            spark, [(1, "the quick brown fox jumps over the lazy dog")]
        )
        out = {
            r["pos"]: r
            for r in concordance(docs, "the", context=3).collect()
        }
        assert set(out) == {0, 6}
        assert out[0]["left"] == "" and out[0]["right"] == "quick brown fox"
        assert out[6]["left"] == "fox jumps over"
        assert out[6]["right"] == "lazy dog"
        assert all(r["match"] == "the" for r in out.values())

    def test_no_match_and_guards(self, spark):
        import pytest as _pytest

        from web_scrapper_spark.operators.textops import concordance

        docs = self._docs(spark, [(1, "a b c"), (2, None)])
        assert concordance(docs, "zz", context=2).collect() == []
        with _pytest.raises(ValueError):
            concordance(docs, "two words")
        with _pytest.raises(ValueError):
            concordance(docs, "a", context=0)


class TestPrefixSuggest:
    """Autocomplete (textops.prefix_suggest)."""

    def _docs(self, spark, rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_popularity_ranking_and_exact_prefix(self, spark):
        from web_scrapper_spark.operators.textops import prefix_suggest

        docs = self._docs(
            spark,
            [(1, "car card card cargo cart"), (2, "card car")],
        )
        out = prefix_suggest(docs, ["car"], k=3).collect()
        # card cnt 3 > car cnt 2 > cargo/cart cnt 1 (tie -> cargo)
        assert [(r["term"], r["cnt"], r["rank"]) for r in out] == [
            ("card", 3, 1), ("car", 2, 2), ("cargo", 1, 3)
        ]

    def test_index_path_equals_docs_path(self, spark):
        from web_scrapper_spark.operators.textops import (
            build_postings,
            prefix_suggest,
        )

        docs = self._docs(spark, [(1, "net nets nested x"), (2, "net y")])
        idx = build_postings(docs, 2)
        a = sorted(
            tuple(r) for r in prefix_suggest(docs, ["ne"], k=5).collect()
        )
        b = sorted(
            tuple(r)
            for r in prefix_suggest(prefixes=["ne"], index=idx, k=5).collect()
        )
        assert a == b and a

    def test_guards(self, spark):
        import pytest as _pytest

        from web_scrapper_spark.operators.textops import prefix_suggest

        docs = self._docs(spark, [(1, "x")])
        with _pytest.raises(ValueError):
            prefix_suggest(docs, ["  "])
        with _pytest.raises(ValueError):
            prefix_suggest(docs, ["a"], k=0)
        with _pytest.raises(ValueError):
            prefix_suggest(docs, ["a"], index=docs)


class TestReviewFixesSearchOps:
    """Regression pins for the round-5 review findings."""

    def test_seed_never_its_own_related_term(self, spark):
        from web_scrapper_spark.operators.textops import term_cooccurrence

        docs = spark.createDataFrame(
            [(1, "alpha x alpha y alpha"), (2, "alpha alpha")],
            "doc_id long, text string",
        )
        out = term_cooccurrence(
            docs, ["alpha"], window=3, k=10, min_pairs=1
        ).collect()
        assert "alpha" not in {r["term"] for r in out}
        assert {r["term"] for r in out} == {"x", "y"}

    def test_seed_count_table_filtered_before_broadcast(self, spark):
        from web_scrapper_spark.operators import textops

        docs = spark.createDataFrame(
            [(1, "seed n1 n2 n3")], "doc_id long, text string"
        )
        plan_buf = []
        out = textops.term_cooccurrence(
            docs, ["seed"], window=3, k=5, min_pairs=1
        )
        import contextlib
        import io

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            out.explain("formatted")
        # the broadcast side must carry the seed filter (isin), not
        # the whole vocabulary
        plan = buf.getvalue()
        assert "seed" in plan  # sanity: plan rendered
        rows = out.collect()
        assert {r["term"] for r in rows} == {"n1", "n2", "n3"}

    def test_padded_prefix_is_stripped(self, spark):
        from web_scrapper_spark.operators.textops import prefix_suggest

        docs = spark.createDataFrame(
            [(1, "berry berry apple")], "doc_id long, text string"
        )
        out = prefix_suggest(docs, ["  be "], k=3).collect()
        assert [(r["prefix"], r["term"]) for r in out] == [("be", "berry")]

    def test_cli_df_gates_refused_with_input_too(self, spark, tmp_path):
        from click.testing import CliRunner

        import web_scrapper_spark.cli as cli_mod

        docs = spark.createDataFrame(
            [(1, "a b")], "doc_id long, text string"
        )
        dpath = str(tmp_path / "d.parquet")
        docs.write.parquet(dpath)
        runner = CliRunner()
        for mode in (["--must", "a"], ["--suggest", "a"],
                     ["--complete", "a"], ["--phrase", "a b"]):
            r = runner.invoke(
                cli_mod.cli,
                ["analyze", "search", "-i", dpath, "--min-df", "2",
                 "--cpus", "4"] + mode,
            )
            assert r.exit_code != 0, mode
            assert "df gates" in r.output, mode

    def test_cli_phrase_usage_error_not_traceback(self, spark, tmp_path):
        from click.testing import CliRunner

        import web_scrapper_spark.cli as cli_mod

        docs = spark.createDataFrame(
            [(1, "a b")], "doc_id long, text string"
        )
        dpath = str(tmp_path / "d.parquet")
        docs.write.parquet(dpath)
        runner = CliRunner()
        r = runner.invoke(
            cli_mod.cli,
            ["analyze", "search", "-i", dpath, "--phrase", "!!!",
             "--cpus", "4"],
        )
        assert r.exit_code == 2
        assert "at least one token" in r.output


class TestPositionGaps:
    """Position-list gap codec (textops.delta_encode/decode_positions)."""

    def test_gaps_and_roundtrip(self, spark):
        from web_scrapper_spark.operators.textops import (
            build_positional_postings,
            delta_decode_positions,
            delta_encode_positions,
        )

        docs = spark.createDataFrame(
            [(1, "x a x b x"), (2, "x x x"), (3, "y x")],
            "doc_id long, text string",
        )
        idx = build_positional_postings(docs, 3, block_size=2)
        enc = delta_encode_positions(idx)
        row = {
            (r["term"], r["block"]): r for r in enc.collect()
        }[("x", 0)]
        # doc1 x@0,2,4 -> gaps [0,2,2]; doc2 x@0,1,2 -> [0,1,1]
        assert [list(g) for g in row["position_gaps"]] == [
            [0, 2, 2], [0, 1, 1]
        ]
        # python-side prefix-sum replay of every gap list
        for r in enc.collect():
            for gaps in r["position_gaps"]:
                acc, out = 0, []
                for g in gaps:
                    acc += g
                    out.append(acc)
                assert out == sorted(out)
        dec = delta_decode_positions(enc)

        def canon(df):
            return sorted(tuple(map(str, r)) for r in df.collect())

        assert canon(dec.select(*sorted(idx.columns))) == canon(
            idx.select(*sorted(idx.columns))
        )

    def test_guard(self, spark):
        import pytest as _pytest

        from web_scrapper_spark.operators.textops import (
            delta_encode_positions,
        )

        docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
        with _pytest.raises(ValueError):
            delta_encode_positions(docs)


class TestProximityFromIndex:
    def test_index_path_equals_docs_path(self, spark):
        from web_scrapper_spark.operators.textops import (
            build_positional_postings,
            proximity_search,
        )

        rows = [
            (1, "cat x dog y cat dog"),
            (2, "cat x x x x x x x dog"),
            (3, "dog cat"),
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        idx = build_positional_postings(docs, 3, block_size=2)
        a = proximity_search(docs, "cat dog", window=3, k=10).collect()
        b = proximity_search(
            query="cat dog", index=idx, window=3, k=10
        ).collect()
        assert [tuple(r) for r in a] == [tuple(r) for r in b]
        assert [r["doc_id"] for r in a] == [1, 3]

    def test_guard_both_sources(self, spark):
        import pytest as _pytest

        from web_scrapper_spark.operators.textops import proximity_search

        docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
        with _pytest.raises(ValueError):
            proximity_search(docs, "x", index=docs)
        with _pytest.raises(ValueError):
            proximity_search(query="x")
