"""Serving-path tests: top-K recommendations from trained pipelines."""

import numpy as np

from iisan_tpu.config import IISANConfig
from iisan_tpu.data.synthetic import synthetic_corpus, synthetic_taps
from iisan_tpu.serve import Recommender
from iisan_tpu.train.cached import CachedTrainer


_TRAINER_CACHE = {}


def make_trainer(compute_dtype="float32"):
    """One trained trainer per dtype, shared across the file: every
    consumer is read-only (top_k / from_trainer), and training it once
    halves the file's runtime."""
    if compute_dtype in _TRAINER_CACHE:
        return _TRAINER_CACHE[compute_dtype]
    cfg = IISANConfig(
        batch_size=8, epoch=1, embedding_dim=16,
        side_adapter_vit_list="1,3", side_adapter_bert_list="1,3",
        word_embedding_dim=24, image_embedding_dim=24,
        compute_dtype=compute_dtype, eval_batch_size=16)
    corpus = synthetic_corpus(n_users=24, item_num=40)
    tr = CachedTrainer(cfg, corpus, synthetic_taps(40, 3, 24, 1),
                       synthetic_taps(40, 3, 24, 2))
    tr.run_epoch(1)
    _TRAINER_CACHE[compute_dtype] = tr
    return tr


def test_topk_shapes_and_validity():
    tr = make_trainer()
    rec = Recommender.from_trainer(tr)
    seqs = [[1, 5, 9], [2, 2, 7, 12, 3]]
    ids, scores = rec.top_k(seqs, k=5)
    assert ids.shape == (2, 5) and scores.shape == (2, 5)
    assert ids.min() >= 1 and ids.max() <= 40  # never the pad item
    # scores sorted descending
    assert np.all(np.diff(scores, axis=1) <= 1e-6)


def test_history_exclusion():
    tr = make_trainer()
    rec = Recommender.from_trainer(tr)
    seq = [list(range(1, 31))]  # user has seen items 1..30 of 40
    ids, _ = rec.top_k(seq, k=10)
    assert set(ids[0]) <= set(range(31, 41))
    ids2, _ = rec.top_k(seq, k=10, exclude_history=False)
    assert len(set(ids2[0]) & set(range(1, 31))) > 0 or True  # may overlap


def test_ragged_and_long_sequences():
    tr = make_trainer()
    rec = Recommender.from_trainer(tr)
    seqs = [[3], list(range(1, 25))]  # shorter than L and longer than L
    ids, scores = rec.top_k(seqs, k=3)
    assert ids.shape == (2, 3)
    assert np.isfinite(scores).all()


def test_id_pipeline_recommender():
    from iisan_tpu.train.id_pipeline import IDTrainer

    cfg = IISANConfig(pipeline="id", batch_size=8, epoch=1, embedding_dim=16,
                      compute_dtype="float32")
    corpus = synthetic_corpus(n_users=24, item_num=40)
    tr = IDTrainer(cfg, corpus)
    tr.run_epoch(1)
    rec = Recommender.from_trainer(tr)
    ids, _ = rec.top_k([[4, 8, 15]], k=4)
    assert ids.shape == (1, 4) and ids.min() >= 1


def test_save_load_roundtrip(tmp_path):
    """Recommender.save -> load reproduces identical recommendations
    without a trainer, caches, or towers (deployment artifact)."""
    tr = make_trainer()
    rec = Recommender.from_trainer(tr)
    seqs = [[1, 5, 9], [2, 2, 7, 12, 3], list(range(1, 11))]
    want_ids, want_scores = rec.top_k(seqs, k=7)

    path = str(tmp_path / "recommender.npz")
    rec.save(path)
    rec2 = Recommender.load(path)
    got_ids, got_scores = rec2.top_k(seqs, k=7)
    np.testing.assert_array_equal(got_ids, want_ids)
    np.testing.assert_allclose(got_scores, want_scores, rtol=1e-5)


def test_save_load_roundtrip_bfloat16(tmp_path):
    """The DEFAULT compute dtype is bfloat16; np.savez stores ml_dtypes
    bf16 as raw void ('|V2'), so save() must cast for the artifact to be
    loadable at all (code-review r3 finding)."""
    tr = make_trainer(compute_dtype="bfloat16")
    rec = Recommender.from_trainer(tr)
    seqs = [[1, 5, 9], [2, 7, 12]]
    want_ids, _ = rec.top_k(seqs, k=5)
    path = str(tmp_path / "rec_bf16.npz")
    rec.save(path)
    rec2 = Recommender.load(path)
    got_ids, got_scores = rec2.top_k(seqs, k=5)
    assert np.isfinite(got_scores).all()
    np.testing.assert_array_equal(got_ids, want_ids)


def test_serve_cli_roundtrip(tmp_path):
    """python -m iisan_tpu.serve: artifact + behaviors-layout input TSV
    -> top-K TSV matching the in-process Recommender."""
    from iisan_tpu import serve

    tr = make_trainer()
    rec = Recommender.from_trainer(tr)
    artifact = str(tmp_path / "rec.npz")
    rec.save(artifact)

    seqs = [[1, 5, 9], [2, 2, 7, 12, 3]]
    inp = tmp_path / "seqs.tsv"
    inp.write_text("U1\t1 5 9\nU2\t2 2 7 12 3\n")
    out = tmp_path / "recs.tsv"
    assert serve.main([artifact, "--input", str(inp), "--out", str(out),
                       "--k", "5", "--batch", "1"]) == 0

    want_ids, want_scores = Recommender.load(artifact).top_k(seqs, k=5)
    lines = out.read_text().splitlines()
    assert len(lines) == 2
    for row, (user, w_ids, w_sc) in zip(
            lines, zip(["U1", "U2"], want_ids, want_scores)):
        u, ids_str, sc_str = row.split("\t")
        assert u == user
        np.testing.assert_array_equal(
            np.array(ids_str.split(), np.int64), w_ids)
        np.testing.assert_allclose(
            np.array(sc_str.split(), np.float64), w_sc, atol=1e-4)


def test_serve_cli_rejects_out_of_range_ids(tmp_path):
    import pytest

    from iisan_tpu import serve

    rec = Recommender.from_trainer(make_trainer())
    artifact = str(tmp_path / "rec.npz")
    rec.save(artifact)
    inp = tmp_path / "seqs.tsv"
    inp.write_text("U1\t1 9999\n")
    with pytest.raises(SystemExit, match="out of range"):
        serve.main([artifact, "--input", str(inp),
                    "--out", str(tmp_path / "recs.tsv")])


def test_export_recommender_flag(tmp_path):
    """--export_recommender writes a ready-to-serve artifact at the end
    of run_from_config; the artifact reproduces the trainer's top-K."""
    from iisan_tpu.config import IISANConfig
    from iisan_tpu.train.pipelines import run_from_config

    rng = np.random.default_rng(0)
    n_items = 20
    with open(tmp_path / "items.tsv", "w") as f:
        for i in range(n_items):
            f.write(f"I{i:04d}\tTitle {i}\n")
    with open(tmp_path / "users.tsv", "w") as f:
        for u in range(12):
            seq = " ".join(f"I{int(x):04d}" for x in
                           rng.integers(0, n_items, size=8))
            f.write(f"U{u}\t{seq}\n")
    artifact = str(tmp_path / "deploy.npz")
    cfg = IISANConfig(
        root_data_dir=str(tmp_path), dataset="", behaviors="users.tsv",
        news="items.tsv", images="items.tsv", pipeline="id", epoch=1,
        batch_size=4, embedding_dim=16, max_seq_len=4, min_seq_len=3,
        eval_batch_size=8, compute_dtype="float32",
        log_dir=str(tmp_path / "logs"), ckpt_dir=str(tmp_path / "ckpts"),
        save_checkpoints=False, export_recommender=artifact)
    trainer, _ = run_from_config(cfg)

    want_ids, _ = Recommender.from_trainer(trainer).top_k([[1, 2, 3]], k=5)
    got_ids, _ = Recommender.load(artifact).top_k([[1, 2, 3]], k=5)
    np.testing.assert_array_equal(got_ids, want_ids)


def test_serve_cli_rejects_empty_history(tmp_path):
    import pytest

    from iisan_tpu import serve

    rec = Recommender.from_trainer(make_trainer())
    artifact = str(tmp_path / "rec.npz")
    rec.save(artifact)
    inp = tmp_path / "seqs.tsv"
    inp.write_text("U1\t1 2\nU2\t\n")
    with pytest.raises(SystemExit, match="empty item history"):
        serve.main([artifact, "--input", str(inp),
                    "--out", str(tmp_path / "recs.tsv")])


def test_export_recommender_in_eval_only(tmp_path):
    """--export_recommender also works in eval-only mode (load a
    checkpoint later, export an artifact without retraining)."""
    import os

    from iisan_tpu.config import IISANConfig
    from iisan_tpu.train.pipelines import run_from_config

    rng = np.random.default_rng(1)
    n_items = 20
    with open(tmp_path / "items.tsv", "w") as f:
        for i in range(n_items):
            f.write(f"I{i:04d}\tTitle {i}\n")
    with open(tmp_path / "users.tsv", "w") as f:
        for u in range(12):
            seq = " ".join(f"I{int(x):04d}" for x in
                           rng.integers(0, n_items, size=8))
            f.write(f"U{u}\t{seq}\n")
    artifact = str(tmp_path / "deploy_eval.npz")
    cfg = IISANConfig(
        root_data_dir=str(tmp_path), dataset="", behaviors="users.tsv",
        news="items.tsv", images="items.tsv", pipeline="id", epoch=1,
        batch_size=4, embedding_dim=16, max_seq_len=4, min_seq_len=3,
        eval_batch_size=8, compute_dtype="float32",
        log_dir=str(tmp_path / "logs"), ckpt_dir=str(tmp_path / "ckpts"),
        save_checkpoints=False, export_recommender=artifact)
    run_from_config(cfg, eval_only=True)
    assert os.path.exists(artifact)
    ids, _ = Recommender.load(artifact).top_k([[1, 2, 3]], k=5)
    assert ids.shape == (1, 5)


def test_serve_cli_empty_input(tmp_path):
    from iisan_tpu import serve

    rec = Recommender.from_trainer(make_trainer())
    artifact = str(tmp_path / "rec.npz")
    rec.save(artifact)
    inp = tmp_path / "empty.tsv"
    inp.write_text("\n\n")
    out = tmp_path / "recs.tsv"
    assert serve.main([artifact, "--input", str(inp),
                       "--out", str(out)]) == 0
    assert out.read_text() == ""


def test_http_serving(tmp_path):
    """Online HTTP mode: responses match direct top_k; bad requests get
    400s with a reason; /healthz reports the catalog."""
    import json
    import threading
    import urllib.error
    import urllib.request

    from iisan_tpu.serve import serve_http

    tr = make_trainer()
    rec = Recommender.from_trainer(tr)
    server = serve_http(rec, "127.0.0.1", 0, max_batch=8)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{port}"

    def post(payload, path="/recommend"):
        req = urllib.request.Request(
            base + path, data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req) as r:
            return json.loads(r.read())

    try:
        with urllib.request.urlopen(base + "/healthz") as r:
            health = json.loads(r.read())
        assert health["status"] == "ok" and health["catalog_items"] == 40

        seqs = [[1, 5, 9], [2, 2, 7, 12, 3]]
        out = post({"sequences": seqs, "k": 5})
        # server buckets: batch _bucket(2)=2 (no padding), hist 8, k 8
        # (power-of-two), then truncates the response to the requested 5
        want_ids, want_scores = rec.top_k(seqs, k=8, hist_len=8)
        assert out["items"] == want_ids[:, :5].tolist()
        np.testing.assert_allclose(out["scores"], want_scores[:, :5],
                                   rtol=1e-6)

        # k beyond the unmasked catalog: the -inf tail comes back as
        # null items/scores (strict-JSON safe), finite prefix intact
        out = post({"sequences": [list(range(1, 36))], "k": 10})
        tail = [p for p in zip(out["items"][0], out["scores"][0])
                if p[1] is None]
        assert tail and all(i is None for i, _ in tail)
        assert all(s is not None for s in out["scores"][0][:5])

        for bad in ({"sequences": []}, {"sequences": [[]]},
                    {"sequences": [[999]]}, {"sequences": [[1]], "k": 0},
                    {}):
            try:
                post(bad)
                assert False, f"expected 400 for {bad}"
            except urllib.error.HTTPError as e:
                assert e.code == 400
                assert "error" in json.loads(e.read())
        try:
            post({"sequences": [[1]]}, path="/nope")
            assert False, "expected 404"
        except urllib.error.HTTPError as e:
            assert e.code == 404
    finally:
        server.shutdown()


def test_http_serving_concurrent():
    """Concurrent clients: bucketing + the dispatch lock must keep every
    response consistent with a direct top_k of the same request."""
    import json
    import threading
    import urllib.request

    from iisan_tpu.serve import serve_http

    tr = make_trainer()
    rec = Recommender.from_trainer(tr)
    server = serve_http(rec, "127.0.0.1", 0, max_batch=8)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()

    rng = np.random.default_rng(0)
    reqs = [[[int(x) for x in rng.integers(1, 41, size=rng.integers(1, 9))]
             for _ in range(int(rng.integers(1, 4)))] for _ in range(12)]
    results = [None] * len(reqs)

    def call(i):
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/recommend",
            data=json.dumps({"sequences": reqs[i], "k": 4}).encode())
        with urllib.request.urlopen(req) as r:
            results[i] = json.loads(r.read())

    threads = [threading.Thread(target=call, args=(i,))
               for i in range(len(reqs))]
    [t.start() for t in threads]
    [t.join() for t in threads]

    try:
        for i, out in enumerate(results):
            assert out is not None, f"request {i} failed"
            n = len(reqs[i])
            b = 1
            while b < n:
                b *= 2
            hist = 1
            while hist < max(len(s) for s in reqs[i]):
                hist *= 2
            want_ids, want_scores = rec.top_k(
                reqs[i] + [[1]] * (b - n), k=4, hist_len=hist)
            assert out["items"] == want_ids[:n].tolist()
            np.testing.assert_allclose(out["scores"], want_scores[:n],
                                       rtol=1e-6)
    finally:
        server.shutdown()


def test_sharded_recommender_matches_unsharded():
    """Catalog-sharded serving on the 8-device mesh: identical scores
    (and ids, absent ties) to the single-device Recommender, including
    history exclusion with ids on every shard, k > rows-per-shard, and
    the padded tail rows never being recommended."""
    import jax

    from iisan_tpu.serve import ShardedRecommender

    if len(jax.devices()) < 8:
        import pytest

        pytest.skip("needs the 8-device virtual mesh")

    tr = make_trainer()
    rec = Recommender.from_trainer(tr)
    sh = ShardedRecommender(rec)  # 40+1 rows over 8 devices -> ragged pad

    rng = np.random.default_rng(3)
    seqs = [[int(x) for x in rng.integers(1, 41, size=n)]
            for n in (1, 4, 7, 12)]
    for k in (3, 10, 39):  # 39 > rows_local: per-shard candidate cap path
        ids_a, sc_a = rec.top_k(seqs, k=k)
        ids_b, sc_b = sh.top_k(seqs, k=k)
        np.testing.assert_allclose(sc_b, sc_a, rtol=1e-6)
        # id parity only where scores are finite: near-catalog k both
        # paths fill the tail with -inf (masked) columns whose tie order
        # is undefined
        finite = np.isfinite(sc_a)
        np.testing.assert_array_equal(np.where(finite, ids_b, -1),
                                      np.where(finite, ids_a, -1))
        assert ids_b[finite].min() >= 1 and ids_b[finite].max() <= 40

    # exclude_history=False parity too
    ids_a, sc_a = rec.top_k(seqs, k=5, exclude_history=False)
    ids_b, sc_b = sh.top_k(seqs, k=5, exclude_history=False)
    np.testing.assert_allclose(sc_b, sc_a, rtol=1e-6)

    # long history spanning every shard
    long = [list(range(1, 31))]
    ids_a, _ = rec.top_k(long, k=10)
    ids_b, _ = sh.top_k(long, k=10)
    assert set(ids_b[0]) <= set(range(31, 41))
    np.testing.assert_array_equal(ids_b, ids_a)


def test_cli_shard_batch_mode(tmp_path):
    """--shard routes the batch CLI through ShardedRecommender; output
    rows equal the unsharded CLI's."""
    from iisan_tpu.serve import main as serve_main

    tr = make_trainer()
    rec = Recommender.from_trainer(tr)
    art = str(tmp_path / "art.npz")
    rec.save(art)
    inp = tmp_path / "in.tsv"
    inp.write_text("u1\t1 5 9\nu2\t2 7 12 3\n")
    out_a, out_b = str(tmp_path / "a.tsv"), str(tmp_path / "b.tsv")
    serve_main([art, "--input", str(inp), "--out", out_a, "--k", "5"])
    serve_main([art, "--input", str(inp), "--out", out_b, "--k", "5",
                "--shard"])
    assert open(out_a).read() == open(out_b).read()


def test_quantized_serving_table(tmp_path):
    """Int8 serving: scoring with the scale factored out of the matmul
    equals scoring a densely dequantized table (to fp32 rounding); the
    artifact stores ~1/4 the table bytes; sharded parity holds too."""
    import os

    import jax

    from iisan_tpu.serve import ShardedRecommender

    tr = make_trainer()
    rec = Recommender.from_trainer(tr)
    qrec = rec.quantize_table()

    # reference: the SAME quantized values, densely dequantized up front
    from iisan_tpu.ops.quant import dequantize

    dense = np.asarray(dequantize(qrec.fused_table), np.float32)[:, 0, :]
    ref = Recommender(rec.model, rec.params, dense, rec.max_seq_len)

    seqs = [[1, 5, 9], [2, 2, 7, 12, 3], list(range(1, 20))]
    ids_q, sc_q = qrec.top_k(seqs, k=7)
    ids_r, sc_r = ref.top_k(seqs, k=7)
    np.testing.assert_allclose(sc_q, sc_r, rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(ids_q, ids_r)

    # quantization error itself stays small vs the fp32 table
    _, sc_f = rec.top_k(seqs, k=7)
    np.testing.assert_allclose(sc_q, sc_f, rtol=0.2, atol=0.05)

    # artifact roundtrip + size
    p_f, p_q = str(tmp_path / "f.npz"), str(tmp_path / "q.npz")
    rec.save(p_f)
    qrec.save(p_q)
    re = Recommender.load(p_q)
    ids2, sc2 = re.top_k(seqs, k=7)
    np.testing.assert_array_equal(ids2, ids_q)
    np.testing.assert_allclose(sc2, sc_q, rtol=1e-6)
    # table bytes: (N,D) int8 + (N,) scales vs (N,D) fp32 (the artifact
    # total is dominated by encoder params at this tiny test scale)
    zf, zq = np.load(p_f), np.load(p_q)
    q_bytes = zq["table_q"].nbytes + zq["table_scale"].nbytes
    # ~1/4 at real dims; the per-row fp32 scale adds 25% at this toy
    # D=16, so bound at 0.35
    assert q_bytes < 0.35 * zf["fused_table"].nbytes

    if len(jax.devices()) >= 8:
        sh = ShardedRecommender(qrec)
        ids_s, sc_s = sh.top_k(seqs, k=7)
        np.testing.assert_allclose(sc_s, sc_q, rtol=1e-5, atol=1e-5)
        np.testing.assert_array_equal(ids_s, ids_q)


def test_cli_save_as_quantized(tmp_path):
    """--quant int8 --save-as: one-command artifact conversion; the
    converted artifact serves identically to in-process quantization."""
    from iisan_tpu.serve import main as serve_main

    rec = Recommender.from_trainer(make_trainer())
    art = str(tmp_path / "f.npz")
    rec.save(art)
    small = str(tmp_path / "q.npz")
    assert serve_main([art, "--quant", "int8", "--save-as", small]) == 0
    got_ids, got_sc = Recommender.load(small).top_k([[1, 5, 9]], k=5)
    want_ids, want_sc = rec.quantize_table().top_k([[1, 5, 9]], k=5)
    np.testing.assert_array_equal(got_ids, want_ids)
    np.testing.assert_allclose(got_sc, want_sc, rtol=1e-6)


def test_serving_tables_are_device_resident(tmp_path):
    """quantize_table() and load() must hand jit device-committed arrays:
    host-numpy tables re-upload the whole catalog on EVERY top_k call
    (the r2 int8-serving latency regression - 2-3x bf16 p50 was tunnel
    transfer, not int8 math)."""
    import jax

    tr = make_trainer()
    rec = Recommender.from_trainer(tr)

    qrec = rec.quantize_table()
    assert isinstance(qrec.fused_table.q, jax.Array)
    assert isinstance(qrec.fused_table.scale, jax.Array)

    p = str(tmp_path / "a.npz")
    rec.save(p)
    loaded = Recommender.load(p)
    assert isinstance(loaded.fused_table, jax.Array)
    assert all(isinstance(leaf, jax.Array)
               for leaf in jax.tree_util.tree_leaves(loaded.params))

    qp = str(tmp_path / "q.npz")
    qrec.save(qp)
    qloaded = Recommender.load(qp)
    assert isinstance(qloaded.fused_table.q, jax.Array)
