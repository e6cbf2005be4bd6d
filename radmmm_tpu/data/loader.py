"""Threaded prefetching data loader.

Replaces torch DataLoader workers (data_modules.py:135-156): a thread pool
loads/augments items (IO-bound host work), batches are collated and
featurized on device, and a small prefetch queue keeps the accelerator fed.
Broken items collapse to None and are dropped, matching the reference's
collate behavior (data.py:624).
"""
from __future__ import annotations

import queue
import threading

import numpy as np
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Iterable, Optional

from radmmm_tpu.data.collate import BucketBatcher, collate_host


def stack_raw_batches(raws):
    """Stack K same-shape raw_arrays() dicts along a new leading axis.

    Host-side prep for the megastep (training/step.py
    make_train_megastep): the loader's shape_runs scheduling makes
    same-shape runs the norm, so K collated batches become ONE pytree
    upload + ONE dispatch."""
    return {k: np.stack([r[k] for r in raws]) for k in raws[0]}


def prefetch_stacked_groups(loader, featurizer, k: int, depth: int = 2,
                            sharding=None):
    """Yield (n, stacked_device_pytree, audio_lengths_host) groups of up to
    `k` same-shape raw batches, with stacking + host->device transfer
    pipelined in a daemon thread `depth` groups ahead.
    audio_lengths_host is the (n, B) numpy copy of the group's audio
    lengths, kept host-side so consumers can count real frames without a
    device fetch.

    Why: on a relay-attached chip the upload of a stacked K-group (tens of
    MB of int16 audio) costs a large fraction of the megastep's device
    time; issued asynchronously ahead of consumption it rides under the
    previous group's compute instead of serializing with it. jax.device_put
    is thread-safe and asynchronous — the queue holds in-flight transfers.

    ``sharding``: optional NamedSharding for the stacked (K, B, ...) pytree
    — P(None, 'data') lays the batch dim over the mesh's data axis, so the
    megastep composes with data-parallel meshes. Multi-process runs
    assemble the global array from each process's local stack
    (jax.make_array_from_process_local_data), the same semantics as
    parallel.mesh.shard_batch but for whole K-groups.

    The consumer decides group vs per-batch fallback (phase boundaries):
    a partial or boundary-straddling group is unstacked on device with
    jax.tree.map(lambda x: x[i], stacked) at negligible cost.

    Measured no-go (round 5): streaming each raw BATCH to the device as
    wav IO finishes it (then jit-stacking the K batches on device) looks
    like it should hide more upload under compute, but each batch is ~12
    pytree leaves -> ~96 transfer RPCs per group at the relay's ~30 ms
    per-RPC latency ≈ 3.9 s of pure overhead: 8.3k frames/s/chip vs 45.9k
    for this one-burst path on the same day/chip. One stacked pytree per
    group keeps the RPC count at ~12 per ~19 MB, which amortizes latency
    to <5% of the transfer; bench.py's relay_overlap_capable row shows the
    burst itself already rides under compute as far as tunnel bandwidth
    allows.
    """
    import jax

    def put_group(stacked):
        if sharding is None:
            return jax.device_put(stacked)
        if jax.process_count() > 1:
            return jax.tree_util.tree_map(
                lambda x: jax.make_array_from_process_local_data(
                    sharding, np.asarray(x)), stacked)
        return jax.device_put(stacked, sharding)

    q: queue.Queue = queue.Queue(maxsize=depth)
    sentinel = object()
    stop = threading.Event()

    def put(item) -> bool:
        """Timed put that gives up when the consumer is gone — an abandoned
        generator (early break / exception) must not leave this daemon
        thread blocked on a full queue pinning stacked device groups."""
        while not stop.is_set():
            try:
                q.put(item, timeout=0.5)
                return True
            except queue.Full:
                continue
        return False

    def producer():
        try:
            pending, pshape = [], None

            def flush():
                ok = True
                if pending:
                    stacked = stack_raw_batches(pending)
                    lens = np.array(stacked["audio_lengths"])
                    ok = put((len(pending), put_group(stacked), lens))
                    pending.clear()
                return ok

            for host in loader:
                if stop.is_set():
                    return
                raw = featurizer.raw_arrays(host)
                shape = (raw["audio_i16"].shape, raw["text"].shape)
                if pending and (shape != pshape or len(pending) == k):
                    if not flush():
                        return
                pending.append(raw)
                pshape = shape
            flush()
        except BaseException as e:  # propagate into the consumer
            put(e)
        finally:
            put(sentinel)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is sentinel:
                break
            if isinstance(item, BaseException):
                raise item
            yield item
        t.join()
    finally:
        # consumer exited (normally, by break, or by exception): release the
        # producer and drain any in-flight groups so their device buffers
        # (tens of MB each) are dropped promptly
        stop.set()
        while True:
            try:
                q.get_nowait()
            except queue.Empty:
                break


class DataLoader:
    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 featurizer: Optional[Callable] = None,
                 num_threads: int = 4, prefetch: int = 2, seed: int = 0,
                 hop_length: int = 256, drop_last: bool = False,
                 process_index: Optional[int] = None,
                 process_count: Optional[int] = None,
                 uniform_shape: bool = False,
                 shape_runs: int = 0):
        self.dataset = dataset
        self.batch_size = batch_size
        self.featurizer = featurizer
        self.num_threads = num_threads
        self.prefetch = prefetch
        self.hop_length = hop_length
        self.drop_last = drop_last
        # multi-host DP (jax.distributed): each process takes a strided
        # subset of batches, truncated so every host runs the same number of
        # steps per epoch (no straggler deadlock at the collectives)
        if process_count is None:
            import jax
            process_count = jax.process_count()
            process_index = jax.process_index()
        self.process_index = process_index or 0
        self.process_count = max(1, process_count)
        lengths = [u.duration for u in dataset.data]
        self._seed = seed
        self.batcher = BucketBatcher(lengths, batch_size, shuffle, seed)
        # megastep scheduling: reorder each epoch's batches so same-
        # (B, frames, text) batches come out in consecutive runs of up to
        # `shape_runs`, padded to the scheduled shape — the trainer's
        # megastep (K batches per device dispatch) then gets full K-groups
        # by construction instead of by bucketing luck. Multi-host runs
        # chunk each shape group's completed process-rounds into the same
        # runs on every process (the batcher sequence is seed-identical),
        # so the K-group boundaries agree globally.
        self.shape_runs = int(shape_runs)
        self._runs_rng = np.random.default_rng(seed ^ 0x5EED)
        if self.process_count > 1 or self.shape_runs > 0:
            # multi-host: every process must contribute a same-shaped local
            # batch to each global step (jax.make_array_from_process_local_
            # data requires it), so shapes are scheduled host-side from
            # filelist metadata: mel frames from durations, text tokens
            # from a one-time encode pass (deterministic).
            sr = getattr(dataset, "sampling_rate", 22050)
            # duration augmentation lengthens audio after scheduling; scale
            # by the worst-case stretch so pad_to always covers the
            # post-augmentation length (no silent truncation)
            aug = getattr(dataset, "augmentations", None)
            dur_factor = (aug.max_duration_factor()
                          if aug is not None else 1.0)
            self._sched_frames = np.array(
                [1 + int(np.ceil(u.duration * dur_factor * sr))
                 // self.hop_length
                 for u in dataset.data], np.int64)
            self._sched_text = np.array(
                [dataset.encoded_text_length(i)
                 for i in range(len(dataset.data))], np.int64)
            self._warned_drop = False
            # validation loaders schedule ONE dataset-global shape: with few
            # batches per epoch, per-bucket shapes rarely pair up into full
            # process_count rounds, silently dropping most (or all) of the
            # val set. Uniform padding trades a little compute for losing at
            # most process_count-1 tail batches.
            self._uniform_shape = uniform_shape
        else:
            self._uniform_shape = False

    def __len__(self):
        """Batches this process yields per epoch. Multi-host: simulated
        from a same-seed clone of the batcher, so the count reflects the
        shape-grouped schedule's dropped tail groups (exact for the first
        epoch; later epochs reshuffle membership so it's an estimate)."""
        if self.process_count == 1:
            return len(self.batcher)
        if not hasattr(self, "_len_cache"):
            clone = BucketBatcher(self.batcher.lengths,
                                  self.batcher.batch_size,
                                  self.batcher.shuffle, self._seed)
            counts: dict = {}
            for indices in clone:
                key = self._shape_key(np.asarray(indices))
                counts[key] = counts.get(key, 0) + 1
            self._len_cache = sum(n // self.process_count
                                  for n in counts.values())
        return self._len_cache

    def _shape_key(self, indices):
        from radmmm_tpu.data.collate import round_up
        sel = slice(None) if self._uniform_shape else indices
        frames = round_up(int(self._sched_frames[sel].max()), 64)
        text = round_up(int(self._sched_text[sel].max()), 16)
        return (len(indices), frames, text)

    def _my_batches(self):
        """Yield (indices, pad_to) for this process.

        Single-process: every batch, natural bucket shapes. Multi-host:
        batches are grouped by scheduled (B, frames, text) shape and dealt
        to processes in rounds within each group, so all processes run the
        same number of steps with agreeing global shapes; leftover batches
        that can't fill a round are dropped (DDP drop_last semantics).
        """
        if self.process_count == 1:
            if self.shape_runs <= 0:
                for indices in self.batcher:
                    yield indices, None
                return
            # megastep scheduling: group this epoch's batches by scheduled
            # shape, chunk each group into runs of <= shape_runs, shuffle
            # the RUN order (membership was already reshuffled by the
            # batcher), and pin pad_to so every batch in a run collates to
            # the identical padded shape.
            by_key: dict = {}
            for indices in self.batcher:
                indices = np.asarray(indices)
                by_key.setdefault(self._shape_key(indices), []).append(
                    list(map(int, indices)))
            runs = [(key, batches[i:i + self.shape_runs])
                    for key, batches in by_key.items()
                    for i in range(0, len(batches), self.shape_runs)]
            if self.batcher.shuffle:
                self._runs_rng.shuffle(runs)
            for key, batches in runs:
                for indices in batches:
                    yield indices, key[1:]
            return
        pending: dict = {}
        runs_pending: dict = {}
        dropped = 0
        for indices in self.batcher:
            indices = np.asarray(indices)
            key = self._shape_key(indices)
            group = pending.setdefault(key, [])
            group.append(indices)
            if len(group) == self.process_count:
                mine = list(map(int, group[self.process_index]))
                pending[key] = []
                if self.shape_runs <= 0:
                    yield mine, key[1:]
                    continue
                # buffer completed rounds into runs of K: every process
                # sees the same (key, round) sequence, so the emitted runs
                # (and hence the megastep K-group boundaries) agree globally
                run = runs_pending.setdefault(key, [])
                run.append(mine)
                if len(run) == self.shape_runs:
                    for m in run:
                        yield m, key[1:]
                    runs_pending[key] = []
        for key, run in runs_pending.items():   # partial runs at epoch end
            for m in run:
                yield m, key[1:]
        dropped = sum(len(g) for g in pending.values())
        if dropped and not self._warned_drop and self.process_index == 0:
            self._warned_drop = True
            print(f"DataLoader: dropped {dropped} tail batch(es)/epoch that "
                  f"couldn't fill a {self.process_count}-process round "
                  f"(shape-grouped multi-host scheduling)")

    def _load_batch(self, pool, indices, pad_to=None):
        items = list(pool.map(self.dataset.__getitem__, indices))
        if pad_to is not None:
            # multi-host: B must stay uniform across processes — backfill
            # broken (None) items with a repeat instead of dropping
            good = [x for x in items if x is not None]
            if not good:
                raise RuntimeError(
                    f"all items broken in batch {list(indices)}")
            items = [x if x is not None else good[0] for x in items]
        host = collate_host(items, hop_length=self.hop_length,
                            pad_to=pad_to)
        if host is None:
            return None
        if self.drop_last and len(host["idx"]) < self.batch_size:
            return None
        return self.featurizer(host) if self.featurizer else host

    def __iter__(self) -> Iterable:
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        sentinel = object()

        def producer():
            try:
                with ThreadPoolExecutor(self.num_threads) as pool:
                    for indices, pad_to in self._my_batches():
                        q.put(self._load_batch(pool, indices, pad_to))
            except BaseException as e:  # propagate into the consumer
                q.put(e)
            finally:
                q.put(sentinel)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            batch = q.get()
            if batch is sentinel:
                break
            if isinstance(batch, BaseException):
                raise batch
            if batch is not None:
                yield batch
        t.join()
