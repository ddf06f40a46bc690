"""Tarred-shard dataset ingestion (webdataset-style), host-sharded.

Behavioral parity target: reference `_TarredAudioToTextDataset`
(`/root/reference/nemo/collections/asr/data/audio_to_text.py:976-1346`) and
its shard machinery (`expand_audio_filepaths:170-215`): brace expansion
(`audio_{0..127}.tar` or `audio__OP_0..127_CL_.tar`), `scatter` (each worker
gets a shard subset) vs `replicate` strategies, shuffle buffer of `shuffle_n`
samples, manifest lookup by tar-member key.

The webdataset dependency is replaced by a direct `tarfile` stream reader —
the tar format is the storage contract, not the library.
"""

from __future__ import annotations

import io
import os
import re
import tarfile
from typing import Dict, Iterator, List, Optional

import numpy as np

from conformer_nemo_tpu.data.manifest import AudioTextSample, read_manifest

_BRACE = re.compile(r"(\{|_OP_)(\d+)\.\.(\d+)(\}|_CL_)")


def expand_sharded_filepaths(
    paths: str | List[str],
    shard_strategy: str = "scatter",
    world_size: int = 1,
    global_rank: int = 0,
) -> List[str]:
    """Brace expansion + rank partitioning (audio_to_text.py:170-215)."""
    if isinstance(paths, str):
        paths = [p for p in paths.split(",") if p]
    expanded: List[str] = []
    for p in paths:
        m = _BRACE.search(p)
        if m:
            lo, hi = int(m.group(2)), int(m.group(3))
            for i in range(lo, hi + 1):
                expanded.append(p[: m.start()] + str(i) + p[m.end():])
        else:
            expanded.append(p)

    if shard_strategy == "scatter":
        if len(expanded) % world_size != 0:
            raise ValueError(
                f"number of shards ({len(expanded)}) must be divisible by "
                f"world_size ({world_size}) for the 'scatter' strategy"
            )
        per = len(expanded) // world_size
        return expanded[global_rank * per : (global_rank + 1) * per]
    if shard_strategy == "replicate":
        return expanded
    raise ValueError(f"unknown shard_strategy: {shard_strategy}")


def _member_key(name: str) -> str:
    """Tar member name -> manifest lookup key (basename, NeMo convention:
    '/' and '.' in the relative path are replaced by '_')."""
    return os.path.basename(name)


class TarredAudioTextDataset:
    """Iterates (samples, tokens, text) from tar shards with a shuffle buffer.

    Manifest provides {audio_filepath, duration, text}; tar members are the
    audio files, matched by basename.
    """

    def __init__(
        self,
        audio_tar_filepaths,
        manifest_filepath: str,
        tokenizer,
        sample_rate: int = 16000,
        shuffle_n: int = 0,
        min_duration: Optional[float] = None,
        max_duration: Optional[float] = None,
        shard_strategy: str = "scatter",
        world_size: int = 1,
        global_rank: int = 0,
        augmentor=None,
        seed: int = 0,
    ):
        self.shards = expand_sharded_filepaths(
            audio_tar_filepaths, shard_strategy, world_size, global_rank
        )
        self.tokenizer = tokenizer
        self.sample_rate = sample_rate
        self.shuffle_n = shuffle_n
        self.augmentor = augmentor
        self.seed = seed
        samples = read_manifest(
            manifest_filepath, min_duration=min_duration, max_duration=max_duration
        )
        self.by_key: Dict[str, AudioTextSample] = {}
        for s in samples:
            self.by_key[os.path.basename(s.audio_file)] = s

    def _decode_member(self, tf: tarfile.TarFile, member: tarfile.TarInfo):
        data = tf.extractfile(member).read()
        from conformer_nemo_tpu.data.audio_io import decode_audio_bytes, resample_poly

        wav, sr = decode_audio_bytes(data, hint=member.name)
        if wav.ndim > 1:
            wav = wav.mean(axis=1)
        wav = resample_poly(wav, sr, self.sample_rate)
        if self.augmentor is not None:
            wav = self.augmentor.perturb(wav, self.sample_rate)
        return wav

    def __iter__(self) -> Iterator[tuple]:
        rng = np.random.RandomState(self.seed)
        shards = list(self.shards)
        rng.shuffle(shards)
        buffer: List[tuple] = []
        for shard in shards:
            with tarfile.open(shard, "r|*") as tf:  # streaming mode
                for member in tf:
                    if not member.isfile():
                        continue
                    key = _member_key(member.name)
                    meta = self.by_key.get(key)
                    if meta is None:
                        continue
                    wav = self._decode_member(tf, member)
                    tokens = self.tokenizer.text_to_ids(meta.text)
                    item = (wav, tokens, meta.text)
                    if self.shuffle_n > 1:
                        buffer.append(item)
                        if len(buffer) >= self.shuffle_n:
                            idx = rng.randint(len(buffer))
                            yield buffer.pop(idx)
                    else:
                        yield item
        rng.shuffle(buffer)
        yield from buffer


class TarredBatchIterator:
    """Fixed-shape batches from a TarredAudioTextDataset stream."""

    def __init__(self, dataset: TarredAudioTextDataset, batch_size: int,
                 max_samples_len: int, max_tokens: int, pad_id: int = 0):
        self.ds = dataset
        self.batch_size = batch_size
        self.max_len = max_samples_len
        self.max_tokens = max_tokens
        self.pad_id = pad_id

    def __iter__(self):
        from conformer_nemo_tpu.data.dataset import Batch

        buf = []
        for wav, tokens, text in self.ds:
            buf.append((wav, tokens, text))
            if len(buf) == self.batch_size:
                yield self._collate(buf)
                buf = []
        if buf:
            yield self._collate(buf)

    def _collate(self, items):
        from conformer_nemo_tpu.data.dataset import Batch

        b = self.batch_size
        audio = np.zeros((b, self.max_len), np.float32)
        audio_lens = np.zeros((b,), np.int32)
        tokens = np.full((b, self.max_tokens), self.pad_id, np.int32)
        token_lens = np.zeros((b,), np.int32)
        texts = []
        for i, (wav, toks, text) in enumerate(items):
            n = min(len(wav), self.max_len)
            audio[i, :n] = wav[:n]
            audio_lens[i] = n
            toks = (toks or [])[: self.max_tokens]
            tokens[i, : len(toks)] = toks
            token_lens[i] = len(toks)
            texts.append(text)
        texts.extend([""] * (b - len(items)))
        return Batch(audio, audio_lens, tokens, token_lens, texts)
