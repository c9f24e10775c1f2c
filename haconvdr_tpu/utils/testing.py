"""Deterministic fake tokenizer for tests and offline development.

Implements the subset of the HF tokenizer protocol the data layer uses
(encode / tokenize / convert_tokens_to_ids / special-token ids) with a
stable whitespace vocabulary, including the reference-relevant distinction
that ``encode(..., max_length=...)`` does NOT truncate unless
``truncation=True`` (transformers>=3 semantics relied on at
src/data.py:279 vs :312).
"""

from __future__ import annotations

from typing import Dict, List


class FakeTokenizer:
    cls_token_id = 0
    pad_token_id = 1
    sep_token_id = 2
    unk_token_id = 3

    def __init__(self):
        self._vocab: Dict[str, int] = {}

    def _id(self, token: str) -> int:
        if token not in self._vocab:
            self._vocab[token] = 4 + len(self._vocab)
        return self._vocab[token]

    def tokenize(self, text: str) -> List[str]:
        return text.split()

    def convert_tokens_to_ids(self, tokens: List[str]) -> List[int]:
        return [self._id(t) for t in tokens]

    def encode(
        self,
        text: str,
        add_special_tokens: bool = True,
        max_length: int | None = None,
        truncation: bool = False,
    ) -> List[int]:
        ids = [self._id(t) for t in self.tokenize(text)]
        if add_special_tokens:
            ids = [self.cls_token_id] + ids + [self.sep_token_id]
        if truncation and max_length is not None and len(ids) > max_length:
            # HF keeps the leading specials and re-appends [SEP]
            ids = ids[: max_length - 1] + [self.sep_token_id]
        return ids
