"""Host↔device transfer utilities (wav2lip_tpu/utils/transfer.py).

The trainers' critical path depends on two invariants: ``put_batch`` must
place batches exactly as the synchronous ``shard_batch`` would (same
shardings → same jit cache entries), and ``DevicePrefetcher`` must deliver
device batches in order, propagate worker errors, and retire cleanly —
it is the mechanism that takes the host→device upload off the step path
(the reference's upload blocks the step, wav2lip_train.py:215-218).
"""

import itertools
import time

import jax
import numpy as np
import pytest

from wav2lip_tpu.parallel.mesh import make_mesh, shard_batch
from wav2lip_tpu.utils.transfer import (
    DevicePrefetcher,
    fetch_tree,
    put_batch,
    put_tree,
)


@pytest.fixture
def mesh8():
    return make_mesh(jax.devices()[:8])


@pytest.fixture
def mesh1():
    return make_mesh(jax.devices()[:1])


def _batch(b=8):
    r = np.random.default_rng(0)
    return {
        "x": r.integers(0, 256, (b, 2, 8, 8, 6), dtype=np.uint8),
        "mel": r.standard_normal((b, 80, 16)).astype(np.float32),
    }


class TestPutBatch:
    def test_matches_shard_batch_placement_multi(self, mesh8):
        host = _batch(8)
        want = shard_batch(mesh8, host)
        got = put_batch(host, mesh8)
        for k in host:
            assert got[k].sharding == want[k].sharding, k
            np.testing.assert_array_equal(np.asarray(got[k]), host[k])
            assert got[k].dtype == host[k].dtype

    def test_matches_shard_batch_placement_single(self, mesh1):
        host = _batch(4)
        want = shard_batch(mesh1, host)
        got = put_batch(host, mesh1)
        for k in host:
            assert got[k].sharding == want[k].sharding, k
            np.testing.assert_array_equal(np.asarray(got[k]), host[k])

    def test_no_mesh_single_device(self):
        host = _batch(4)
        got = put_batch(host)
        for k in host:
            np.testing.assert_array_equal(np.asarray(got[k]), host[k])

    def test_indivisible_batch_replicates(self, mesh8):
        host = {"x": np.ones((3, 4), np.float32)}
        got = put_batch(host, mesh8)
        # mirrors shard_batch's fallback: replicated, not sharded
        assert got["x"].sharding.is_fully_replicated
        np.testing.assert_array_equal(np.asarray(got["x"]), host["x"])

    def test_tuple_batch(self, mesh1):
        host = (np.ones((4, 5), np.float32),
                np.zeros((4, 1), np.float32))
        got = put_batch(host, mesh1)
        assert isinstance(got, tuple) and len(got) == 2
        np.testing.assert_array_equal(np.asarray(got[0]), host[0])


class TestDevicePrefetcher:
    def test_order_and_values(self):
        batches = [{"a": np.full((4, 2), i, np.float32)} for i in range(6)]
        feed = DevicePrefetcher(iter(batches))
        got = [float(np.asarray(next(feed)["a"])[0, 0]) for _ in range(6)]
        assert got == [0.0, 1.0, 2.0, 3.0, 4.0, 5.0]
        with pytest.raises(StopIteration):
            next(feed)
        with pytest.raises(StopIteration):  # repeated next keeps raising
            next(feed)
        feed.close()

    def test_error_propagates(self):
        def gen():
            yield {"a": np.zeros((2, 2), np.float32)}
            raise RuntimeError("loader exploded")

        feed = DevicePrefetcher(gen())
        next(feed)
        with pytest.raises(RuntimeError, match="loader exploded"):
            next(feed)
        feed.close()

    def test_backpressure_bounded(self):
        """An infinite source must not be drained eagerly: the queue depth
        bounds how far ahead the worker runs."""
        pulled = [0]

        def gen():
            while True:
                pulled[0] += 1
                yield {"a": np.zeros((2,), np.float32)}

        feed = DevicePrefetcher(gen(), depth=2)
        next(feed)
        deadline = time.time() + 2.0
        while pulled[0] < 3 and time.time() < deadline:
            time.sleep(0.01)
        time.sleep(0.1)  # would keep growing without backpressure
        assert pulled[0] <= 5  # 1 consumed + 2 queued + ≤2 in flight
        feed.close()

    def test_close_is_idempotent_and_unblocks_worker(self):
        feed = DevicePrefetcher(
            itertools.repeat({"a": np.zeros((2,), np.float32)}), depth=1
        )
        next(feed)
        feed.close()
        feed.close()
        assert not feed._thread.is_alive()

    def test_custom_put(self, mesh8):
        """The trainers pass put=self._shard; the batch must arrive through
        that exact callable."""
        calls = []

        def put(b):
            calls.append(True)
            return put_batch(b, mesh8)

        feed = DevicePrefetcher(iter([_batch(8)]), put=put)
        out = next(feed)
        assert calls and out["x"].sharding.num_devices == 8
        feed.close()


class TestPutFetchTree:
    def test_roundtrip_multi_dtype(self):
        r = np.random.default_rng(1)
        tree = {
            "w": r.standard_normal((7, 3)).astype(np.float32),
            "b": r.integers(0, 100, (5,), dtype=np.int32),
            "scalar": np.float32(2.5),
        }
        dev = put_tree(tree)
        back = fetch_tree(dev)
        np.testing.assert_array_equal(back["w"], tree["w"])
        np.testing.assert_array_equal(back["b"], tree["b"])
        assert float(back["scalar"]) == 2.5
