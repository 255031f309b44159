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


def cycle(iterable: Sequence) -> Iterator:
    while True:
        for item in iterable:
            yield item
