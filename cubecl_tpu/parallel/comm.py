"""Server-level collective communication.

Reference: the ``ServerCommunication`` trait — comm_init / all_reduce /
send / recv / sync_collective with ``ReduceOperation{Sum,Mean}``
(cubecl-runtime/src/server/base.rs:575-692) and its NCCL implementation
(cubecl-cuda/src/compute/communication.rs:14-106: unique-id registry per
sorted device set, per-device rank, dedicated comm stream).

TPU-native shape (SURVEY §5): collectives ride jax.lax over ICI inside a
``shard_map`` on a Mesh — XLA inserts the ring algorithms. The same
client-facing API is kept: a ``Communicator`` over a set of clients with
``all_reduce``/``all_gather``/``broadcast``/``send``-style ops; on one
device they degenerate to copies so the API is topology-independent.
"""

from __future__ import annotations

import enum
from typing import Dict, List, Optional, Sequence

import numpy as np

from ..runtime.client import ComputeClient
from ..runtime.handle import Handle


class ReduceOperation(enum.Enum):
    SUM = "sum"
    MEAN = "mean"
    MAX = "max"
    MIN = "min"


class CommunicationId:
    """Identity of a communicator = the sorted device set (reference
    CommunicationId, server/base.rs:557)."""

    def __init__(self, clients: Sequence[ComputeClient]):
        self.devices = tuple(sorted(
            str(c._dev.call(lambda s: s.device)) for c in clients))

    def __hash__(self):
        return hash(self.devices)

    def __eq__(self, other):
        return isinstance(other, CommunicationId) and \
            self.devices == other.devices


_COMMUNICATORS: Dict[CommunicationId, "Communicator"] = {}


class Communicator:
    """A collective group over clients (ranks = list order)."""

    def __init__(self, clients: Sequence[ComputeClient]):
        import collections
        import jax

        self.clients = list(clients)
        self.devices = [c._dev.call(lambda s: s.device) for c in clients]
        self.id = CommunicationId(clients)
        from jax.sharding import Mesh

        self._mesh = Mesh(np.array(self.devices), ("rank",))
        self._jitted: Dict[str, object] = {}
        # p2p mailboxes: (src_rank, dst_rank, tag) -> FIFO of delivered
        # handles (two-sided send/recv semantics over one-sided ICI puts)
        self._mailbox: Dict[tuple, "collections.deque"] = \
            collections.defaultdict(collections.deque)

    @staticmethod
    def init(clients: Sequence[ComputeClient]) -> "Communicator":
        """comm_init (reference server/base.rs:612): one communicator per
        device set, registry-cached."""
        cid = CommunicationId(clients)
        comm = _COMMUNICATORS.get(cid)
        if comm is None:
            comm = Communicator(clients)
            _COMMUNICATORS[cid] = comm
        return comm

    @property
    def world_size(self) -> int:
        return len(self.clients)

    # ---------------------------------------------------------- collectives

    def _collective(self, name: str, handles: Sequence[Handle], fn):
        """Run fn inside shard_map over the rank axis; handles are
        rank-local arrays of identical shape."""
        import jax
        import jax.numpy as jnp
        from jax.sharding import NamedSharding, PartitionSpec as P

        try:
            from jax import shard_map
        except ImportError:  # older jax
            from jax.experimental.shard_map import shard_map

        shape = handles[0].shape
        sharding = NamedSharding(self._mesh, P("rank"))
        # zero-copy assembly: each rank's buffer is already on its device
        shards = [jnp.asarray(h.array).reshape((1,) + tuple(shape))
                  for h in handles]
        stacked = jax.make_array_from_single_device_arrays(
            (len(handles),) + tuple(shape), sharding, shards)
        key = f"{name}|{shape}|{handles[0].dtype}"
        jf = self._jitted.get(key)
        if jf is None:
            sm = shard_map(fn, mesh=self._mesh, in_specs=P("rank"),
                           out_specs=P("rank"), check_vma=False)
            jf = jax.jit(sm)
            self._jitted[key] = jf
        out = jf(stacked)
        for i, h in enumerate(handles):
            h.array = out[i]

    def all_reduce(self, handles: Sequence[Handle],
                   op: ReduceOperation = ReduceOperation.SUM) -> None:
        """In-place all-reduce across ranks (reference all_reduce,
        server/base.rs:632) — psum/pmax over ICI."""
        import jax
        import jax.numpy as jnp

        assert len(handles) == self.world_size

        def fn(x):
            if op == ReduceOperation.SUM:
                return jax.lax.psum(x, "rank")
            if op == ReduceOperation.MEAN:
                return jax.lax.pmean(x, "rank")
            if op == ReduceOperation.MAX:
                return jax.lax.pmax(x, "rank")
            return jax.lax.pmin(x, "rank")

        self._collective(f"all_reduce_{op.value}", handles, fn)

    def all_gather(self, handles: Sequence[Handle]) -> List[Handle]:
        """Each rank ends with the concatenation over ranks."""
        import jax
        import jax.numpy as jnp

        def fn(x):
            return jax.lax.all_gather(x, "rank", axis=0, tiled=False
                                      ).reshape(1, -1)

        shape0 = handles[0].shape
        n = self.world_size
        outs = []
        self._collective("all_gather", handles, fn)
        for h in handles:
            h.shape = (n * int(np.prod(shape0)),)
        return list(handles)

    def reduce_scatter(self, handles: Sequence[Handle]) -> None:
        import jax

        n = self.world_size

        def fn(x):
            return jax.lax.psum_scatter(x, "rank", scatter_dimension=1,
                                        tiled=True)

        # reshape rank-local (n*k,) -> (1, n*k); scatter over dim 1
        import jax.numpy as jnp

        for h in handles:
            h.array = jnp.asarray(h.array).reshape(1, -1)
            h.shape = tuple(h.array.shape)
        self._collective("reduce_scatter", handles, fn)
        for h in handles:
            h.array = h.array.reshape(-1)
            h.shape = tuple(h.array.shape)

    def broadcast(self, handles: Sequence[Handle], root: int = 0) -> None:
        """Root's buffer replaces every rank's buffer (send/recv analogue —
        device_put over ICI instead of the reference's NCCL send/recv,
        communication.rs:60-106)."""
        import jax

        src = handles[root].array
        for i, h in enumerate(handles):
            if i != root:
                h.array = jax.device_put(src, self.devices[i])

    def _rank_of(self, h: Handle) -> int:
        """Rank whose device holds this handle's buffer."""
        import jax

        arr = h.array
        devs = (list(arr.devices()) if hasattr(arr, "devices")
                else [arr.device] if hasattr(arr, "device") else [])
        for i, d in enumerate(self.devices):
            if any(str(d) == str(ad) for ad in devs):
                return i
        raise ValueError(
            f"handle lives on {devs}, not in this communicator's device set")

    def send(self, src: Handle, dst_rank: int, tag: int = 0) -> Handle:
        """Point-to-point send half (reference ServerCommunication::send,
        server/base.rs:657): the buffer moves to ``dst_rank``'s device over
        ICI and is posted to the (src, dst, tag) mailbox for the matching
        :meth:`recv`. Returns the destination handle (one-sided use keeps
        working; two-sided callers pair it with recv)."""
        import jax

        src_rank = self._rank_of(src)
        arr = jax.device_put(src.array, self.devices[dst_rank])
        h = self.clients[dst_rank]._dev.call(lambda s: s.create(arr))
        self._mailbox[(src_rank, dst_rank, tag)].append(h)
        return h

    def recv(self, src_rank: int, dst_rank: int, tag: int = 0) -> Handle:
        """Point-to-point recv half (reference ServerCommunication::recv,
        server/base.rs:668-680): pops the oldest message posted by the
        matching :meth:`send`. The transfer itself already rode ICI at
        send time (XLA's transfers are one-sided); recv provides the
        two-sided rendezvous the reference trait exposes, so ring and
        pipeline patterns written against send/recv port directly."""
        q = self._mailbox.get((src_rank, dst_rank, tag))
        if not q:
            raise RuntimeError(
                f"recv({src_rank}->{dst_rank}, tag={tag}): no matching send "
                f"(deliveries are ordered; call send before recv)")
        return q.popleft()

    def ring_exchange(self, handles: Sequence[Handle],
                      shift: int = 1) -> List[Handle]:
        """Every rank sends its buffer to (rank+shift)%n and receives from
        (rank-shift)%n — the ppermute building block at the handle level."""
        n = self.world_size
        assert len(handles) == n
        for r, h in enumerate(handles):
            self.send(h, (r + shift) % n, tag=-1)
        return [self.recv((r - shift) % n, r, tag=-1) for r in range(n)]

    def sync(self) -> None:
        """sync_collective (server/base.rs:598)."""
        for c in self.clients:
            c.sync()
