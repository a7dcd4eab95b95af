"""Micro-batched serving: BatchingPolicy coalesces concurrent requests.

Beyond-reference feature (the reference serves one request per jitted call,
``serve_policy.py:92-107``); batch-1 flow inference is HBM weight-read bound
on TPU so concurrent robots ride the same weight stream.
"""

import threading
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np
import pytest

from lap_tpu.policies.batching import BatchingPolicy

from tests.test_serve_cli import _free_port
from tests.test_serving import TINY, _build_ar_policy, _build_policy, _obs


def _batcher(policy, **kw):
    # background_warmup off in tests: the extra bucket compiles are slow on
    # CPU and irrelevant to what each test asserts (covered explicitly in
    # test_background_warmup_compiles_remaining_buckets).
    kw.setdefault("background_warmup", False)
    return BatchingPolicy(policy, **kw)


def _obs_with_state(value: float):
    o = _obs()
    o["observation"]["state"] = np.full(7, value, np.float32)
    return o


def test_concurrent_requests_coalesce_and_route_correctly():
    policy = _build_policy()
    batcher = _batcher(policy, max_batch=4, window_ms=2000.0)
    try:
        batcher.warmup(_obs())

        def one(i):
            return i, batcher.infer(_obs_with_state(float(i) / 10.0))

        with ThreadPoolExecutor(4) as ex:
            results = dict(ex.map(one, range(4)))
        for i, r in results.items():
            # State passthrough proves no row mixup inside the batch.
            np.testing.assert_allclose(
                r["state"][:7], np.full(7, i / 10.0), rtol=1e-5
            )
            assert r["actions"].shape == (TINY.action_horizon, TINY.action_dim)
            assert np.isfinite(r["actions"]).all()
            assert r["policy_timing"]["infer_ms"] > 0
        # The 4 requests ran in at most 2 device calls (plus 3 warmup calls).
        assert batcher.stats["requests"] == 4
        assert batcher.stats["largest_batch"] >= 2
        sizes = {r["policy_timing"]["batch_size"] for r in results.values()}
        assert max(sizes) >= 2
    finally:
        batcher.close()


def test_same_batch_rows_sample_independent_noise():
    policy = _build_policy()
    batcher = _batcher(policy, max_batch=2, window_ms=2000.0)
    try:
        with ThreadPoolExecutor(2) as ex:
            a, b = list(ex.map(lambda _: batcher.infer(_obs()), range(2)))
        if a["policy_timing"]["batch_size"] == 2:
            # Identical observations in one batch: each row must draw its own
            # noise slice, not share the first row's sample.
            assert not np.allclose(a["actions"], b["actions"])
    finally:
        batcher.close()


def test_padding_to_bucket_drops_padded_rows():
    policy = _build_policy()
    batcher = _batcher(policy, max_batch=4, window_ms=2000.0)
    try:
        with ThreadPoolExecutor(3) as ex:
            results = list(
                ex.map(lambda i: batcher.infer(_obs_with_state(i / 10.0)), range(3))
            )
        assert len(results) == 3
        for i, r in enumerate(results):
            np.testing.assert_allclose(
                r["state"][:7], np.full(7, i / 10.0), rtol=1e-5
            )
        # 3 requests pad up to the 4-bucket: exactly one device call.
        if batcher.stats["largest_batch"] == 3:
            assert batcher.stats["batches"] == 1
    finally:
        batcher.close()


def test_ar_greedy_batched_matches_direct():
    """Greedy (temperature 0) decode is input-deterministic: the batched
    path must produce the same parsed result as a direct infer."""
    policy = _build_ar_policy()
    direct = policy.infer(_obs())
    batcher = _batcher(policy, max_batch=2, window_ms=2000.0)
    try:
        with ThreadPoolExecutor(2) as ex:
            results = list(ex.map(lambda _: batcher.infer(_obs()), range(2)))
        for r in results:
            np.testing.assert_allclose(
                np.asarray(r["actions"]), np.asarray(direct["actions"]), atol=1e-5
            )
            assert r.get("reasoning", "") == direct.get("reasoning", "")
    finally:
        batcher.close()


def test_bad_request_error_propagates_to_caller():
    policy = _build_policy()
    batcher = _batcher(policy, max_batch=2, window_ms=10.0)
    try:
        bad = _obs()
        del bad["observation"]["state"]
        with pytest.raises(Exception):
            batcher.infer(bad)
        # The worker survives a failed batch: a good request still completes.
        r = batcher.infer(_obs())
        assert np.isfinite(r["actions"]).all()
    finally:
        batcher.close()


def test_batched_policy_over_websocket_two_clients():
    from lap_tpu.serving.websocket_client_policy import WebsocketClientPolicy
    from lap_tpu.serving.websocket_policy_server import WebsocketPolicyServer

    policy = _build_policy()
    batcher = _batcher(policy, max_batch=2, window_ms=1000.0)
    port = _free_port()
    server = WebsocketPolicyServer(batcher, host="127.0.0.1", port=port)

    import asyncio

    loop = asyncio.new_event_loop()

    def run():
        asyncio.set_event_loop(loop)
        loop.run_until_complete(server.run())

    t = threading.Thread(target=run, daemon=True)
    t.start()
    time.sleep(0.5)

    def one_client(n):
        client = WebsocketClientPolicy(host="127.0.0.1", port=port)
        outs = [client.infer(_obs()) for _ in range(n)]
        client.close()
        return outs

    try:
        with ThreadPoolExecutor(2) as ex:
            futs = [ex.submit(one_client, 3) for _ in range(2)]
            results = [f.result() for f in futs]
        for outs in results:
            for r in outs:
                assert np.isfinite(r["actions"]).all()
        assert batcher.stats["requests"] == 6
        # With two clients in lockstep and a 1 s window, at least one
        # device call must have coalesced both.
        assert batcher.stats["largest_batch"] == 2
    finally:
        loop.call_soon_threadsafe(loop.stop)
        batcher.close()


def test_background_warmup_compiles_remaining_buckets():
    """With background_warmup on, the first completed request triggers a
    warmup thread that pre-compiles every bucket size."""
    policy = _build_policy()
    batcher = BatchingPolicy(policy, max_batch=2, window_ms=10.0,
                             background_warmup=True)
    try:
        r = batcher.infer(_obs())
        assert np.isfinite(r["actions"]).all()
        assert batcher._warmup_started
        # The warmup thread drives _infer_prepared directly; wait for it to
        # finish so its compiles don't bleed into other tests.
        for t in threading.enumerate():
            if t.name == "lap-batcher-warmup":
                t.join(timeout=300)
        # Buckets are now compiled: a 2-request batch completes promptly.
        with ThreadPoolExecutor(2) as ex:
            outs = list(ex.map(lambda _: batcher.infer(_obs()), range(2)))
        assert all(np.isfinite(o["actions"]).all() for o in outs)
    finally:
        batcher.close()


def test_infer_after_close_raises():
    policy = _build_policy()
    batcher = _batcher(policy, max_batch=2, window_ms=10.0)
    r = batcher.infer(_obs())
    assert np.isfinite(r["actions"]).all()
    batcher.close()
    with pytest.raises(RuntimeError, match="closed"):
        batcher.infer(_obs())


def test_dispatch_groups_by_shape_signature():
    """Unlike-shaped requests must run as separate batches (np.stack would
    throw for the whole batch otherwise), and a request whose inputs cannot
    even be signed fails alone."""
    from concurrent.futures import Future

    from lap_tpu.policies.batching import _Pending

    calls = []

    class StubPolicy:
        metadata = {}

        def _prepare(self, obs):
            return obs

        def _infer_prepared(self, inputs_list, n_results=None):
            calls.append(len(inputs_list))
            return [{"ok": i} for i in range(len(inputs_list[:n_results]))]

    batcher = BatchingPolicy(StubPolicy(), max_batch=4, window_ms=10.0,
                             background_warmup=False)
    try:
        a = _Pending({"x": np.zeros((3,), np.float32)}, Future())
        b = _Pending({"x": np.zeros((3,), np.float32)}, Future())
        c = _Pending({"x": np.zeros((5,), np.float32)}, Future())  # other shape
        batcher._dispatch([a, b, c])
        assert a.future.result(1)["ok"] == 0
        assert b.future.result(1)["ok"] == 1
        assert c.future.result(1)["ok"] == 0
        # Two device calls: the like-shaped pair (padded to 2) and the odd one.
        assert sorted(calls) == [1, 2]
        assert a.batch_size == 2 and c.batch_size == 1
    finally:
        batcher.close()
