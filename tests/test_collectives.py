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

    n = min(4, len(jax.devices()))
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
