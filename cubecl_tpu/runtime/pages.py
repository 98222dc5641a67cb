"""PageAllocator — the serving-side KV block manager.

The device half of paged serving is ``ops/paged_attention`` (scalar-
prefetched block tables drive page-window DMAs). This is the HOST half:
which physical page each sequence owns. vLLM-style semantics:

- a fixed pool of ``num_pages`` physical pages (ids into the device
  k_pages/v_pages pools),
- per-sequence ordered page lists, grown one page at a time,
- ``fork`` (beam search / parallel sampling) shares full pages by
  refcount — the forked branch appends into its OWN fresh pages, so
  shared prefix KV is written once and never copied,
- ``block_table`` assembles the (B, max_pages) int32 table in the
  kernel's repeat-last-page padding convention (repeated runtime block
  indices skip their window re-DMA).

The hot paths live in C++ (``csrc/native.cc`` page_pool_*, bound via
ctypes — reference keeps its analogous pool bookkeeping native in
cubecl-runtime/src/memory_management/memory_pool/); a pure-Python
fallback keeps toolchain-free environments working. All operations are
O(pages touched) and serialized (single serving thread per device
actor is the intended driver).
"""

from __future__ import annotations

import ctypes
from typing import Dict, List, Sequence

import numpy as np

from ..utils.native import load_native


class _PyPagePool:
    """Pure-Python fallback with identical semantics to the native pool."""

    def __init__(self, num_pages: int):
        self.free: List[int] = list(range(num_pages - 1, -1, -1))
        self.refcount = [0] * num_pages
        self.seqs: Dict[int, List[int]] = {}
        self.page_hash = [0] * num_pages
        self.prefix_map: Dict[int, int] = {}
        self.evictable: List[int] = []

    def _take_page(self):
        if self.free:
            return self.free.pop()
        if self.evictable:
            pg = self.evictable.pop(0)
            self.prefix_map.pop(self.page_hash[pg], None)
            self.page_hash[pg] = 0
            return pg
        return -1

    def num_free(self) -> int:
        return len(self.free) + len(self.evictable)

    def alloc_seq(self, seq: int, n: int) -> int:
        if seq in self.seqs:
            return -2
        if self.num_free() < n:
            return -3
        v = []
        for _ in range(n):
            pg = self._take_page()
            self.refcount[pg] = 1
            v.append(pg)
        self.seqs[seq] = v
        return 0

    def append(self, seq: int) -> int:
        if seq not in self.seqs:
            return -2
        pg = self._take_page()
        if pg < 0:
            return -3
        self.refcount[pg] = 1
        self.seqs[seq].append(pg)
        return pg

    def fork(self, src: int, dst: int) -> int:
        if src not in self.seqs or dst in self.seqs:
            return -2
        for pg in self.seqs[src]:
            self.refcount[pg] += 1
        self.seqs[dst] = list(self.seqs[src])
        return 0

    def free_seq(self, seq: int) -> int:
        if seq not in self.seqs:
            return -2
        freed = 0
        for pg in self.seqs.pop(seq):
            self.refcount[pg] -= 1
            if self.refcount[pg] == 0:
                if self.page_hash[pg]:
                    self.evictable.append(pg)   # retained for reuse
                else:
                    self.free.append(pg)
                freed += 1
        return freed

    def register_prefix(self, seq: int, hashes) -> int:
        v = self.seqs.get(seq)
        if v is None or len(v) < len(hashes):
            return -2
        reg = 0
        for i, hv in enumerate(hashes):
            if not hv:
                continue
            pg = v[i]
            if self.page_hash[pg] == hv:
                reg += 1
                continue
            if self.page_hash[pg] or hv in self.prefix_map:
                continue
            self.page_hash[pg] = hv
            self.prefix_map[hv] = pg
            reg += 1
        return reg

    def admit_cached(self, seq: int, hashes) -> int:
        if seq in self.seqs:
            return -2
        v = []
        for hv in hashes:
            pg = self.prefix_map.get(hv)
            if pg is None:
                break
            if self.refcount[pg] == 0 and pg in self.evictable:
                self.evictable.remove(pg)
            self.refcount[pg] += 1
            v.append(pg)
        self.seqs[seq] = v
        return len(v)

    def seq_pages(self, seq: int) -> int:
        return len(self.seqs[seq]) if seq in self.seqs else -1

    def unshare_last(self, seq: int) -> int:
        v = self.seqs.get(seq)
        if not v:
            return -2
        pg = v[-1]
        if self.refcount[pg] <= 1:
            return -4
        np_ = self._take_page()
        if np_ < 0:
            return -3
        self.refcount[np_] = 1
        self.refcount[pg] -= 1
        v[-1] = np_
        return (pg << 32) | np_

    def fill_table(self, seq_ids, out: np.ndarray, max_pages: int) -> int:
        for i, s in enumerate(seq_ids):
            v = self.seqs.get(int(s))
            if v is None or not v or len(v) > max_pages:
                return -2
            out[i, :len(v)] = v
            out[i, len(v):] = v[-1]
        return 0


class PageAllocator:
    """KV block manager over ``num_pages`` physical pages of
    ``page_size`` tokens each."""

    def __init__(self, num_pages: int, page_size: int = 128):
        assert num_pages > 0
        self.num_pages = int(num_pages)
        self.page_size = int(page_size)
        self._lib = load_native()
        self._py = None
        self._h = -1
        if self._lib is not None:
            self._h = int(self._lib.page_pool_create(self.num_pages))
        if self._h < 0:
            self._lib = None
            self._py = _PyPagePool(self.num_pages)
        # logical token lengths (host bookkeeping; the kernel masks
        # against these)
        self.lengths: Dict[int, int] = {}

    @property
    def native(self) -> bool:
        return self._lib is not None

    def __del__(self):
        try:
            if self._lib is not None and self._h >= 0:
                self._lib.page_pool_destroy(self._h)
        except Exception:
            pass

    # -- raw page ops ------------------------------------------------------

    def num_free_pages(self) -> int:
        if self._lib is not None:
            return int(self._lib.page_pool_num_free(self._h))
        return self._py.num_free()

    def seq_page_count(self, seq: int) -> int:
        if self._lib is not None:
            return int(self._lib.page_pool_seq_pages(self._h, seq))
        return self._py.seq_pages(seq)

    def refcount(self, page: int) -> int:
        if self._lib is not None:
            return int(self._lib.page_pool_refcount(self._h, page))
        return self._py.refcount[page]

    # -- sequence lifecycle ------------------------------------------------

    def admit(self, seq: int, prompt_tokens: int) -> bool:
        """Admit a new sequence holding ``prompt_tokens`` tokens; false
        if the pool can't hold it (continuous-batching backpressure)."""
        n = max(1, -(-int(prompt_tokens) // self.page_size))
        if self._lib is not None:
            ok = int(self._lib.page_pool_alloc_seq(self._h, seq, n)) == 0
        else:
            ok = self._py.alloc_seq(seq, n) == 0
        if ok:
            self.lengths[seq] = int(prompt_tokens)
        return ok

    def extend(self, seq: int, tokens: int = 1) -> bool:
        """Record ``tokens`` appended to ``seq``, growing its page list
        when page boundaries are crossed. ALL-OR-NOTHING: False leaves
        the sequence untouched = pool exhausted (the caller should
        evict/preempt — vLLM semantics)."""
        ln = self.lengths[seq]
        new_len = ln + int(tokens)
        need = -(-new_len // self.page_size) - self.seq_page_count(seq)
        if need > 0:
            if self.num_free_pages() < need:
                return False
            for _ in range(need):
                pg = (int(self._lib.page_pool_append(self._h, seq))
                      if self._lib is not None else self._py.append(seq))
                assert pg >= 0  # free-count checked under the same lock
        self.lengths[seq] = new_len
        return True

    def fork(self, src: int, dst: int) -> bool:
        """Share src's pages with a new branch dst (beam search). The
        branch's future appends go to its own fresh pages; the shared
        prefix is never copied. NOTE: if src's LAST page is partially
        filled, both branches would write into it — the caller must
        either fork at page boundaries or device-copy that partial page
        before the branches diverge."""
        if self._lib is not None:
            ok = int(self._lib.page_pool_fork(self._h, src, dst)) == 0
        else:
            ok = self._py.fork(src, dst) == 0
        if ok:
            self.lengths[dst] = self.lengths[src]
        return ok

    def unshare_last(self, seq: int):
        """Copy-on-write completion for a MID-PAGE fork: if seq's last
        page is shared, swap in a fresh private page and return
        (old_page, new_page) so the caller device-copies the partial
        KV content (models/llama.fork_seq does). None = already
        private. Raises on pool exhaustion."""
        r = (int(self._lib.page_pool_unshare_last(self._h, seq))
             if self._lib is not None else self._py.unshare_last(seq))
        if r == -4:
            return None
        if r < 0:
            raise RuntimeError(f"unshare_last({seq}) rc={r}")
        return (r >> 32) & 0xFFFFFFFF, r & 0xFFFFFFFF

    def release(self, seq: int) -> int:
        """Finish a sequence; returns pages actually returned to the
        free list (shared pages stay until every branch releases)."""
        if self._lib is not None:
            freed = int(self._lib.page_pool_free_seq(self._h, seq))
        else:
            freed = self._py.free_seq(seq)
        self.lengths.pop(seq, None)
        return max(freed, 0)

    # -- automatic prefix caching ------------------------------------------

    def _page_hashes(self, tokens) -> list:
        """Chain hashes of the FULL token pages: h_i covers tokens
        0..(i+1)*page-1 via h_i = xxh64(h_{i-1} || page_i_tokens) — the
        vLLM prefix-cache key structure (native xxh64 when built)."""
        import struct

        from ..utils.hashing import stable_hash_bytes

        toks = [int(t) for t in tokens]
        out, parent = [], 0
        for s0 in range(0, len(toks) - self.page_size + 1,
                        self.page_size):
            blob = struct.pack("<Q", parent) + struct.pack(
                f"<{self.page_size}i",
                *toks[s0:s0 + self.page_size])
            parent = int(stable_hash_bytes(blob), 16) or 1
            out.append(parent)
        return out

    def admit_cached(self, seq: int, tokens) -> int:
        """Admit a sequence holding ``tokens``, reusing every cached
        full-page prefix (their device KV is still in the pools —
        retained pages were never handed out). Returns the number of
        CACHED tokens (prefill only the suffix beyond it), or -1 if
        the pool can't hold the sequence (nothing allocated)."""
        import ctypes as ct

        import numpy as np

        hashes = self._page_hashes(tokens)
        if self._lib is not None:
            arr = np.asarray(hashes or [0], np.uint64)
            k = int(self._lib.page_pool_admit_cached(
                self._h, seq,
                arr.ctypes.data_as(ct.POINTER(ct.c_uint64)),
                len(hashes)))
        else:
            k = self._py.admit_cached(seq, hashes)
        if k < 0:
            raise KeyError(f"admit_cached({seq}) rc={k}")
        T = len(tokens)
        need = max(1, -(-T // self.page_size)) - k
        for _ in range(max(need, 0)):
            pg = (int(self._lib.page_pool_append(self._h, seq))
                  if self._lib is not None else self._py.append(seq))
            if pg < 0:
                self.release(seq)
                return -1
        self.lengths[seq] = T
        return k * self.page_size

    def register_prefix(self, seq: int, tokens) -> int:
        """Register the sequence's WRITTEN full pages under their chain
        hashes so later requests reuse them. Call after prefill; only
        pages fully covered by both ``tokens`` and the written length
        register. Returns the number registered."""
        import ctypes as ct

        import numpy as np

        n_full = min(len(tokens), self.lengths.get(seq, 0)) \
            // self.page_size
        hashes = self._page_hashes(tokens)[:n_full]
        if not hashes:
            return 0
        if self._lib is not None:
            arr = np.asarray(hashes, np.uint64)
            return max(0, int(self._lib.page_pool_register_prefix(
                self._h, seq,
                arr.ctypes.data_as(ct.POINTER(ct.c_uint64)),
                len(hashes))))
        return max(0, self._py.register_prefix(seq, hashes))

    # -- kernel interop ----------------------------------------------------

    def block_table(self, seq_ids: Sequence[int],
                    max_pages: int) -> np.ndarray:
        """(B, max_pages) int32 table for ops.paged_attention, padded by
        repeating each row's last page id."""
        ids = np.asarray(list(seq_ids), np.int64)
        out = np.empty((len(ids), int(max_pages)), np.int32)
        if self._lib is not None:
            rc = int(self._lib.page_pool_fill_table(
                self._h, ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                len(ids), out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                int(max_pages)))
        else:
            rc = self._py.fill_table(ids, out, int(max_pages))
        if rc != 0:
            raise KeyError(f"unknown sequence or > {max_pages} pages "
                           f"(rc={rc})")
        return out

    def length_vector(self, seq_ids: Sequence[int]) -> np.ndarray:
        return np.asarray([self.lengths[int(s)] for s in seq_ids], np.int32)
