"""Prompt datasets (functional equivalents of reference utils/dataset.py).

- ``TextDataset``: one prompt per line, optional extended prompts
  (utils/dataset.py:15-38);
- ``TwoTextDataset``: prompt pairs for switch training (utils/dataset.py:41-76);
- ``MultiTextDataset``: JSONL ``{"prompts": [...]}`` for interactive
  generation (utils/dataset.py:79-112);
- ``cycle``: infinite iterator (utils/dataset.py:121-129);
- ``shard``: deterministic per-host sharding replacing DistributedSampler
  (inference.py:145-149).
"""

from __future__ import annotations

import json
from typing import Iterator, List, Optional, Sequence


class TextDataset:
    def __init__(self, prompt_path: str, extended_prompt_path: Optional[str] = None):
        with open(prompt_path, encoding="utf-8") as f:
            self.prompt_list = [line.rstrip() for line in f]
        self.extended_prompt_list = None
        if extended_prompt_path is not None:
            with open(extended_prompt_path, encoding="utf-8") as f:
                self.extended_prompt_list = [line.rstrip() for line in f]
            assert len(self.extended_prompt_list) == len(self.prompt_list)

    def __len__(self):
        return len(self.prompt_list)

    def __getitem__(self, idx):
        batch = {"prompts": self.prompt_list[idx], "idx": idx}
        if self.extended_prompt_list is not None:
            batch["extended_prompts"] = self.extended_prompt_list[idx]
        return batch


class TwoTextDataset:
    """Prompt pairs: first segment prompt + post-switch prompt."""

    def __init__(self, prompt_path: str, switch_prompt_path: str):
        with open(prompt_path, encoding="utf-8") as f:
            self.first = [line.rstrip() for line in f]
        with open(switch_prompt_path, encoding="utf-8") as f:
            self.second = [line.rstrip() for line in f]
        assert len(self.first) == len(self.second)

    def __len__(self):
        return len(self.first)

    def __getitem__(self, idx):
        return {"prompts": self.first[idx], "switch_prompts": self.second[idx],
                "idx": idx}


class MultiTextDataset:
    """JSONL with {"prompts": [p0, p1, ...]} per line (interactive mode)."""

    def __init__(self, jsonl_path: str):
        self.rows: List[List[str]] = []
        with open(jsonl_path, encoding="utf-8") as f:
            for line in f:
                line = line.strip()
                if line:
                    self.rows.append(json.loads(line)["prompts"])

    def __len__(self):
        return len(self.rows)

    def __getitem__(self, idx):
        return {"prompts": self.rows[idx], "idx": idx}


def shard(dataset, host_index: int, host_count: int) -> List:
    """Round-robin shard across hosts (DistributedSampler analogue)."""
    return [dataset[i] for i in range(host_index, len(dataset), host_count)]


def shuffled_indices(n: int, seed: int, epoch: int) -> List[int]:
    """Deterministic per-epoch permutation — DistributedSampler's
    ``shuffle=True`` + ``set_epoch`` semantics (every host computes the
    same order from (seed, epoch); no broadcast needed)."""
    import random as _random

    idx = list(range(n))
    _random.Random((seed << 20) ^ epoch).shuffle(idx)
    return idx


def epoch_shard(dataset, host_index: int, host_count: int, seed: int,
                epoch: int) -> List:
    """Shuffled-then-sharded epoch view: the multi-host training loader
    (reference: DataLoader(sampler=DistributedSampler(shuffle=True)) with
    set_epoch per epoch, trainer/distillation.py train loop)."""
    order = shuffled_indices(len(dataset), seed, epoch)
    return [dataset[i] for i in order[host_index::host_count]]


def cycle(iterable: Sequence) -> Iterator:
    while True:
        for item in iterable:
            yield item


class PrefetchIterator:
    """Bounded background-thread prefetch over any iterator — the
    DataLoader ``num_workers``/``prefetch_factor`` analogue.  On TPU hosts
    this overlaps host-side work (file IO, tokenization, prompt encoding
    feed prep) with device steps; the device dispatch itself is already
    async so depth 2-4 suffices.

    Exceptions raised by the source iterator re-raise at the consuming
    ``next()``; iteration ends cleanly on StopIteration.  Call ``close()``
    (or exhaust it) to join the thread."""

    _END = object()

    def __init__(self, iterable, depth: int = 4):
        import queue
        import threading

        self._q = queue.Queue(maxsize=max(1, depth))
        self._stop = threading.Event()

        def _worker():
            try:
                for item in iterable:
                    if self._stop.is_set():
                        return
                    self._q.put(item)
                self._q.put(self._END)
            except BaseException as e:  # noqa: BLE001 — re-raised at next()
                self._q.put(e)

        self._t = threading.Thread(target=_worker, daemon=True)
        self._t.start()

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if item is self._END:
            self._t.join()
            raise StopIteration
        if isinstance(item, BaseException):
            self._t.join()
            raise item
        return item

    def close(self):
        self._stop.set()
        while not self._q.empty():  # unblock a worker stuck on put()
            self._q.get_nowait()
        self._t.join(timeout=5)


class ShardedCheckpointableLoader:
    """Per-host-sharded, per-epoch-shuffled, CHECKPOINTABLE prompt loader —
    a grain-style resumable iterator behind the same row interface as the
    datasets above.

    The reference resumes training at a step but restarts its DataLoader
    from the epoch head, repeating samples (DistributedSampler has no
    mid-epoch state).  Here ``state()`` captures (epoch, index-in-shard);
    restoring it continues mid-epoch with no repetition and no skips, and
    the shard partition guarantees no sample repetition ACROSS hosts
    within an epoch (same (seed, epoch) permutation on every host,
    disjoint ``host_index::host_count`` slices — the functional analogue
    of DistributedSampler(shuffle=True).set_epoch, inference.py:145-149).

    Prefetch: rows here are in-memory prompt lines, so the loader hands
    rows out synchronously; wrap heavy row transforms in PrefetchIterator
    BEFORE the consumption counter if needed (counting must happen at the
    consumer handoff or checkpoint state would run ahead of training).
    """

    def __init__(self, dataset, host_index: int = 0, host_count: int = 1,
                 seed: int = 0, state: Optional[dict] = None):
        assert 0 <= host_index < host_count
        self.ds = dataset
        self.host_index = host_index
        self.host_count = host_count
        self.seed = seed
        self.epoch = int(state["epoch"]) if state else 0
        self.index = int(state["index"]) if state else 0
        self._order_epoch = -1
        self._order: List[int] = []

    def _shard_order(self) -> List[int]:
        if self._order_epoch != self.epoch:
            order = shuffled_indices(len(self.ds), self.seed, self.epoch)
            self._order = order[self.host_index :: self.host_count]
            self._order_epoch = self.epoch
        return self._order

    def __iter__(self):
        return self

    def __next__(self):
        order = self._shard_order()
        if self.index >= len(order):
            self.epoch += 1
            self.index = 0
            order = self._shard_order()
        row = self.ds[order[self.index]]
        self.index += 1
        return row

    def state(self) -> dict:
        """Position AFTER the last row handed out — save alongside the
        train step; pass back as ``state=`` to resume exactly there."""
        return {"epoch": self.epoch, "index": self.index}
