"""Serving plane (eval/serving.py + cli/serve.py): dynamic-batching
embedding service and its TCP front-end.

Parity contract: a served embedding must equal the offline extraction
pipeline's embedding for the same input -- same bucket shapes, same masked
pooling, same reference-exact chunk averaging (eval/extract.py).  The
batcher only changes WHEN chunks run, never the math.
"""

import threading

import jax
import numpy as np
import pytest

from voxsrc2020_speaker_verification_tpu.cli.serve import (
    ServingClient, make_server,
)
from voxsrc2020_speaker_verification_tpu.eval.export import (
    export_inference_artifact, load_inference_artifact,
)
from voxsrc2020_speaker_verification_tpu.eval.extract import (
    extract_embeddings, make_bucketed_embed_fn,
)
from voxsrc2020_speaker_verification_tpu.eval.serving import EmbeddingService
from voxsrc2020_speaker_verification_tpu.training import (
    TrainConfig, create_train_state,
)

CFG = TrainConfig(
    model="tdnn", projection="sc_cm_linear", num_classes=6, num_centers=2,
    dataset_length=48, feat_dim=40, feat_length=32,
    batch_size=4, num_accumulation_steps=1, bf16=False, exp_root="",
)
BATCH = 4


@pytest.fixture(scope="module")
def artifact(tmp_path_factory):
    state = create_train_state(CFG, jax.random.PRNGKey(0))
    out = str(tmp_path_factory.mktemp("serve") / "artifact")
    export_inference_artifact(CFG, state, out)
    return out


@pytest.fixture(scope="module")
def service(artifact):
    with EmbeddingService(artifact, batch_size=BATCH, max_wait_ms=5.0) as s:
        yield s


def _utts(seed=0):
    rng = np.random.RandomState(seed)
    # short (<25 frames), mid, bucket-boundary, and chunked (>1000 frames)
    return {
        f"u{i:02d}": rng.randn(t, CFG.feat_dim).astype(np.float32)
        for i, t in enumerate([12, 37, 256, 500, 999, 1000, 1337, 2503])
    }


def test_served_embeddings_match_offline_extraction(artifact, service):
    feats = _utts()
    _, embed = load_inference_artifact(artifact)
    fn = make_bucketed_embed_fn(embed, batch_size=BATCH)
    want = extract_embeddings(fn, feats.items(), batch_size=BATCH)
    for utt, f in feats.items():
        got = service.embed_features(f, cmvn=False, timeout=300)
        np.testing.assert_allclose(got, want[utt], atol=1e-5, rtol=1e-5,
                                   err_msg=utt)


def test_bf16_wire_service_matches_fp32(artifact, service):
    """wire='bfloat16' (round 5) must agree with the fp32-wire service
    within input-quantization noise (and exactly for bf16-compute models,
    covered by tests/test_eval.py::test_bf16_wire_parity)."""
    feats = _utts()
    with EmbeddingService(artifact, batch_size=BATCH, max_wait_ms=5.0,
                          wire="bfloat16") as bf:
        for utt, f in feats.items():
            got = bf.embed_features(f, cmvn=False, timeout=300)
            want = service.embed_features(f, cmvn=False, timeout=300)
            np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2,
                                       err_msg=utt)


def test_wave_requests_match_feature_requests(service):
    from voxsrc2020_speaker_verification_tpu.ops.cmvn import sliding_cmvn
    from voxsrc2020_speaker_verification_tpu.ops.fbank import (
        FbankConfig, fbank, num_frames, pcm16,
    )

    rng = np.random.RandomState(1)
    wave = pcm16(rng.randn(3 * 16000 + 321) * 2000).astype(np.float32)
    got = service.embed_wave(wave, timeout=300)

    cfg = FbankConfig(num_bins=CFG.feat_dim, dither=0.0)
    feats = np.asarray(fbank(wave[None], cfg))[0, : num_frames(len(wave), cfg)]
    cm = np.asarray(sliding_cmvn(
        feats[None], np.asarray([len(feats)], np.int32),
        window=300, center=True))[0]
    want = service.embed_features(cm, cmvn=False, timeout=300)
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_concurrent_requests_batch_and_match(artifact):
    """Requests arriving together must pack into full batches (2 flushes
    for 2*BATCH same-bucket requests, not 8) and still resolve each to its
    own correct embedding."""
    feats = {f"c{i}": np.random.RandomState(10 + i)
             .randn(200, CFG.feat_dim).astype(np.float32)
             for i in range(2 * BATCH)}
    with EmbeddingService(artifact, batch_size=BATCH,
                          max_wait_ms=2000.0) as svc:
        svc.embed_features(next(iter(feats.values())),
                           cmvn=False, timeout=300)  # warm the compile
        before = svc.num_flushes
        reqs = {u: svc.submit_features(f, cmvn=False)
                for u, f in feats.items()}
        got = {u: r.result(timeout=300) for u, r in reqs.items()}
        assert svc.num_flushes - before == 2
        serial = {u: svc.embed_features(f, cmvn=False, timeout=300)
                  for u, f in feats.items()}
    for u in feats:
        np.testing.assert_allclose(got[u], serial[u], atol=1e-5, err_msg=u)


def test_score_cosine_and_asnorm(service):
    rng = np.random.RandomState(2)
    a, b = rng.randn(256), rng.randn(256)
    want = float(np.dot(a / np.linalg.norm(a), b / np.linalg.norm(b)))
    assert service.score(a, b) == pytest.approx(want, abs=1e-6)
    # asnorm against the artifact's projection-weight cohort (2*6 rows)
    s = service.score(a, b, asnorm=True, topk=5)
    assert np.isfinite(s) and s != pytest.approx(want, abs=1e-9)
    # symmetric: swapping sides cannot change the score
    assert service.score(b, a, asnorm=True, topk=5) == pytest.approx(s, abs=1e-9)


@pytest.fixture(scope="module")
def server(artifact):
    srv = make_server(artifact, host="127.0.0.1", port=0,
                      batch_size=BATCH, max_wait_ms=5.0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv
    srv.shutdown()
    srv.service.close()


def test_tcp_roundtrip(server):
    host, port = server.server_address[:2]
    rng = np.random.RandomState(3)
    with ServingClient(host, port) as c:
        info = c.ping()
        assert info["model"] == CFG.model
        assert info["feat_dim"] == CFG.feat_dim

        feats = rng.randn(300, CFG.feat_dim).astype(np.float32)
        via_tcp = c.embed_features(feats, cmvn=False)
        direct = server.service.embed_features(feats, cmvn=False, timeout=300)
        np.testing.assert_allclose(via_tcp, direct, atol=1e-6)

        wave = rng.randn(16000) * 2000
        emb_w = c.embed_wave(wave)
        assert emb_w.shape == direct.shape and np.isfinite(emb_w).all()

        sc = c.score(via_tcp, emb_w)
        assert sc == pytest.approx(server.service.score(via_tcp, emb_w),
                                   abs=1e-6)
        sc_n = c.score(via_tcp, emb_w, asnorm=True, topk=5)
        assert np.isfinite(sc_n)


def test_tcp_errors_keep_connection_alive(server):
    host, port = server.server_address[:2]
    with ServingClient(host, port) as c:
        with pytest.raises(RuntimeError, match="unknown op"):
            c._call({"op": "nonsense"})
        with pytest.raises(RuntimeError, match="features must be"):
            c.embed_features(np.zeros((10, CFG.feat_dim + 1), np.float32))
        assert c.ping()["ok"]  # same connection still serves


def test_rejects_bad_feature_dim(service):
    with pytest.raises(ValueError, match="features must be"):
        service.embed_features(np.zeros((50, CFG.feat_dim + 3), np.float32))


def test_rejects_inputs_beyond_serving_caps(service):
    """Lengths past the largest front-end bucket are rejected, not compiled:
    the no-recompile-at-runtime guarantee only holds for a FIXED bucket set
    (round-3 review finding: unbounded per-length compiles)."""
    from voxsrc2020_speaker_verification_tpu.eval import serving as S

    too_long = S._CMVN_BUCKETS[-1] + 1
    with pytest.raises(ValueError, match="exceeds the serving cap"):
        service.embed_features(
            np.zeros((too_long, CFG.feat_dim), np.float32))
    with pytest.raises(ValueError, match="exceeds the serving cap"):
        service.embed_wave(
            np.zeros(16000 * (S._WAVE_BUCKET_SECONDS[-1] + 1), np.float32))


def test_asnorm_topk_guards(service):
    rng = np.random.RandomState(5)
    a, b = rng.randn(256), rng.randn(256)
    with pytest.raises(ValueError, match="topk >= 2"):
        service.score(a, b, asnorm=True, topk=1)
    with pytest.raises(ValueError, match="topk >= 2"):
        service.score(a, b, asnorm=True, topk=0)


def test_warmup_compiles_every_shape(artifact):
    with EmbeddingService(artifact, batch_size=2, max_wait_ms=5.0) as svc:
        svc.warmup(timeout=300)
        # every embed bucket flushed at least once
        assert svc.num_flushes >= len(svc.buckets)
        emb = svc.embed_features(
            np.random.RandomState(0).randn(300, CFG.feat_dim)
            .astype(np.float32), timeout=300)
        assert np.isfinite(emb).all()


def test_timed_out_chunks_are_dropped(artifact):
    """A request abandoned by its waiter must not burn device batches: its
    queued chunks are dropped at the next flush selection (round-3 review
    finding: orphaned chunks were still flushed)."""
    import time as _time

    with EmbeddingService(artifact, batch_size=4,
                          max_wait_ms=60_000.0) as svc:
        req = svc.submit_features(
            np.zeros((200, CFG.feat_dim), np.float32), cmvn=False)
        with pytest.raises(TimeoutError):
            req.result(timeout=0.05)
        flushes_before = svc.num_flushes
        # a new submission wakes the batcher, which prunes cancelled chunks
        live = svc.submit_features(
            np.zeros((100, CFG.feat_dim), np.float32), cmvn=False)
        deadline = _time.time() + 5
        while _time.time() < deadline:
            with svc._lock:
                entries = [e for q in svc._pending.values() for e in q]
            if all(not e[0].cancelled for e in entries):
                break
            _time.sleep(0.01)
        with svc._lock:
            entries = [e for q in svc._pending.values() for e in q]
        assert all(not e[0].cancelled for e in entries)
        # the cancelled request never produced a flush of its own
        assert svc.num_flushes == flushes_before
        assert live.remaining == 1  # still queued (max_wait is a minute)


def test_tcp_fatal_protocol_error_closes_connection(server):
    """An untrustworthy payload size cannot be drained, so the server must
    reply with an error and CLOSE (replying and reading on would parse
    payload bytes as the next header -- round-3 review finding)."""
    host, port = server.server_address[:2]
    c = ServingClient(host, port)
    try:
        with pytest.raises(RuntimeError, match="bad wave length"):
            c._call({"op": "embed", "kind": "wave", "n": 1 << 40})
        with pytest.raises((EOFError, RuntimeError, ConnectionError)):
            c.ping()  # connection was closed after the fatal reply
    finally:
        c.close()


def test_make_server_does_not_leak_service_on_bind_failure(artifact, server):
    """Binding happens before the model loads: a port collision must not
    leak a batcher thread (round-3 review finding)."""
    import threading as _threading

    from voxsrc2020_speaker_verification_tpu.cli.serve import make_server

    host, port = server.server_address[:2]
    before = _threading.active_count()
    with pytest.raises(OSError):
        make_server(artifact, host=host, port=port)  # already bound
    assert _threading.active_count() == before
