"""Collectives over the 8-device virtual CPU mesh.

Reference: runtime_tests/all_reduce.rs + to_client.rs enumerate local
devices and skip under 2 (SURVEY §4); here the virtual mesh guarantees 8.
"""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def clients():
    import jax

    from cubecl_tpu import CpuRuntime

    n = min(8, len(jax.devices()))
    if n < 2:
        pytest.skip("needs >= 2 devices")
    return [CpuRuntime.client(i) for i in range(n)]


def test_all_reduce_sum(clients):
    from cubecl_tpu.parallel import Communicator, ReduceOperation

    comm = Communicator.init(clients)
    datas = [np.random.rand(64).astype(np.float32) for _ in clients]
    handles = [c.create(d) for c, d in zip(clients, datas)]
    comm.all_reduce(handles, ReduceOperation.SUM)
    total = sum(datas)
    for h in handles:
        np.testing.assert_allclose(np.asarray(h.array), total, rtol=1e-6)


def test_all_reduce_mean_max(clients):
    from cubecl_tpu.parallel import Communicator, ReduceOperation

    comm = Communicator.init(clients)
    datas = [np.random.rand(32).astype(np.float32) for _ in clients]
    handles = [c.create(d) for c, d in zip(clients, datas)]
    comm.all_reduce(handles, ReduceOperation.MEAN)
    mean = sum(datas) / len(datas)
    np.testing.assert_allclose(np.asarray(handles[0].array), mean, rtol=1e-6)

    handles = [c.create(d) for c, d in zip(clients, datas)]
    comm.all_reduce(handles, ReduceOperation.MAX)
    mx = np.maximum.reduce(datas)
    np.testing.assert_allclose(np.asarray(handles[-1].array), mx)


def test_all_gather(clients):
    from cubecl_tpu.parallel import Communicator

    comm = Communicator.init(clients)
    datas = [np.full(8, i, np.float32) for i in range(len(clients))]
    handles = [c.create(d) for c, d in zip(clients, datas)]
    comm.all_gather(handles)
    expect = np.concatenate(datas)
    for h in handles:
        np.testing.assert_array_equal(np.asarray(h.array).reshape(-1), expect)


def test_broadcast(clients):
    from cubecl_tpu.parallel import Communicator

    comm = Communicator.init(clients)
    datas = [np.full(8, i, np.float32) for i in range(len(clients))]
    handles = [c.create(d) for c, d in zip(clients, datas)]
    comm.broadcast(handles, root=1)
    for h in handles:
        np.testing.assert_array_equal(np.asarray(h.array), datas[1])


def test_send_p2p(clients):
    from cubecl_tpu.parallel import Communicator

    comm = Communicator.init(clients)
    x = np.random.rand(16).astype(np.float32)
    h = clients[0].create(x)
    h2 = comm.send(h, 1)
    np.testing.assert_array_equal(clients[1].read_one(h2), x)


def test_send_recv_pair(clients):
    """Two-sided p2p: recv returns exactly what the matching send posted
    (reference ServerCommunication send/recv, server/base.rs:657-680)."""
    from cubecl_tpu.parallel import Communicator

    comm = Communicator.init(clients)
    x = np.random.rand(16).astype(np.float32)
    y = np.random.rand(16).astype(np.float32)
    comm.send(clients[0].create(x), 1, tag=7)
    comm.send(clients[0].create(y), 1, tag=7)
    h1 = comm.recv(0, 1, tag=7)
    h2 = comm.recv(0, 1, tag=7)
    np.testing.assert_array_equal(clients[1].read_one(h1), x)  # FIFO order
    np.testing.assert_array_equal(clients[1].read_one(h2), y)
    with pytest.raises(RuntimeError, match="no matching send"):
        comm.recv(0, 1, tag=7)
    with pytest.raises(RuntimeError, match="no matching send"):
        comm.recv(1, 0, tag=7)  # wrong direction


def test_ring_exchange(clients):
    """Every rank's buffer moves to (rank+1) % n via the send/recv pair."""
    from cubecl_tpu.parallel import Communicator

    comm = Communicator.init(clients)
    n = comm.world_size
    datas = [np.full(8, i, np.float32) for i in range(n)]
    handles = [c.create(d) for c, d in zip(clients, datas)]
    got = comm.ring_exchange(handles, shift=1)
    for r in range(n):
        np.testing.assert_array_equal(
            clients[r].read_one(got[r]), datas[(r - 1) % n])


def test_hybrid_mesh_two_slices():
    """Multi-slice mesh: DCN axes outermost; a dp-over-dcn x tp-over-ici
    sharded matmul runs on the virtual 2-slice mesh."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from cubecl_tpu.parallel import make_hybrid_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_hybrid_mesh({"dp": 2}, {"tp": 4})
    assert mesh.axis_names == ("dp", "tp")
    assert dict(mesh.shape) == {"dp": 2, "tp": 4}
    x = np.random.randn(8, 16).astype(np.float32)
    w = np.random.randn(16, 32).astype(np.float32)
    xs = jax.device_put(x, NamedSharding(mesh, P("dp", None)))
    ws = jax.device_put(w, NamedSharding(mesh, P(None, "tp")))
    y = jax.jit(jnp.dot)(xs, ws)
    np.testing.assert_allclose(np.asarray(y), x @ w, rtol=1e-5)


def test_communicator_registry(clients):
    from cubecl_tpu.parallel import Communicator

    c1 = Communicator.init(clients)
    c2 = Communicator.init(list(reversed(clients)))
    assert c1 is c2  # same sorted device set -> same communicator


def test_mesh_helpers():
    import jax

    from cubecl_tpu.parallel import auto_mesh, make_mesh, shard_array

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh({"dp": 4, "tp": 2})
    assert mesh.axis_names == ("dp", "tp")
    x = np.arange(32, dtype=np.float32).reshape(8, 4)
    xs = shard_array(x, mesh, "dp")
    np.testing.assert_array_equal(np.asarray(xs), x)
    m2 = auto_mesh(8)
    assert int(np.prod(list(m2.shape.values()))) == 8
