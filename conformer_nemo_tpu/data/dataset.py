"""Bucketed audio-text dataset + host-sharded loader, TPU-native.

Parity targets:
  * sample -> (audio, tokens) mapping: reference `_AudioTextDataset`
    (`/root/reference/nemo/collections/asr/data/audio_to_text.py:218`).
  * duration bucketing: reference bucketing dataset semantics
    (`audio_to_text_dataset.py:374-427`): per-bucket batch-size scaling,
    fixed_order / synced_randomized / fully_randomized chaining.
  * rank sharding: reference shards tarred datasets by global rank
    (`audio_to_text.py:170`); here each host keeps every
    `process_count`-th sample (`jax.process_index()`).

TPU-first difference: every emitted batch has a STATIC shape drawn from a
small set of (audio_len, token_len) bucket shapes, so XLA compiles one
program per bucket instead of recompiling per batch. Padding is audio zeros /
token pad-id; true lengths ride along for masking.
"""

from __future__ import annotations

import dataclasses
import math
import queue
import random
import threading
from typing import Iterator, List, Optional, Sequence

import numpy as np

from conformer_nemo_tpu.data.audio_io import load_audio
from conformer_nemo_tpu.data.manifest import AudioTextSample


@dataclasses.dataclass
class Batch:
    audio: np.ndarray  # [B, T] float32
    audio_lens: np.ndarray  # [B] int32
    tokens: np.ndarray  # [B, U] int32
    token_lens: np.ndarray  # [B] int32
    texts: List[str]  # reference transcripts (host-side, for WER)

    @property
    def size(self) -> int:
        return self.audio.shape[0]


def make_bucket_boundaries(
    durations: Sequence[float], n_buckets: int, sample_rate: int = 16000
) -> List[int]:
    """Sample-count boundaries at duration quantiles, rounded up to 1600 (0.1 s)
    multiples to cap compile count."""
    if not durations:
        return [16 * sample_rate]
    qs = np.quantile(np.asarray(durations), np.linspace(1.0 / n_buckets, 1.0, n_buckets))
    out = []
    for q in qs:
        samples = int(math.ceil(q * sample_rate / 1600.0)) * 1600
        if not out or samples > out[-1]:
            out.append(samples)
    return out


class BucketedAudioTextDataset:
    """Maps manifest samples to tokenized entries grouped by duration bucket."""

    def __init__(
        self,
        samples: List[AudioTextSample],
        tokenizer,
        sample_rate: int = 16000,
        n_buckets: int = 8,
        token_cap_per_sec: float = 8.0,
        min_token_cap: int = 16,
        trim_silence: bool = False,
        use_start_end_token: bool = False,
        augmentor=None,
    ):
        self.samples = samples
        self.tokenizer = tokenizer
        self.sample_rate = sample_rate
        self.trim_silence = trim_silence
        # waveform augmentation (reference _AudioTextDataset applies the
        # AudioAugmentor inside featurizer.process, audio_to_text.py:275)
        self.augmentor = augmentor
        # reference AudioToBPEDataset semantics (audio_to_text.py:929-940):
        # wrap token ids with bos/eos when the tokenizer defines them
        self.bos_id = getattr(tokenizer, "bos_id", None) if use_start_end_token else None
        self.eos_id = getattr(tokenizer, "eos_id", None) if use_start_end_token else None
        self.boundaries = make_bucket_boundaries(
            [s.duration for s in samples], n_buckets, sample_rate
        )
        # token cap per bucket: proportional to duration (rounded to 8)
        self.token_caps = [
            max(min_token_cap, int(math.ceil(b / sample_rate * token_cap_per_sec / 8.0)) * 8)
            for b in self.boundaries
        ]
        self.bucket_of: List[int] = []
        for s in samples:
            n = int(round(s.duration * sample_rate))
            self.bucket_of.append(self._bucket_index(n))

    def _bucket_index(self, n_samples: int) -> int:
        for i, b in enumerate(self.boundaries):
            if n_samples <= b:
                return i
        return len(self.boundaries) - 1

    def encode_text(self, s: AudioTextSample):
        if s.lang is not None and hasattr(self.tokenizer, "offsets"):
            ids = self.tokenizer.text_to_ids(s.text, s.lang)
        else:
            ids = self.tokenizer.text_to_ids(s.text)
        if ids is not None:
            if self.bos_id is not None and self.bos_id >= 0:
                ids = [self.bos_id] + ids
            if self.eos_id is not None and self.eos_id >= 0:
                ids = ids + [self.eos_id]
        return ids

    def load_item(self, idx: int, rng: Optional[random.Random] = None,
                  pcm16: bool = False):
        """Decode + (optionally) augment + tokenize one sample.

        `rng` seeds augmentation; parallel loaders pass a per-(epoch, idx)
        stream so results are independent of worker scheduling. `pcm16`
        requests int16 output when decodable losslessly (augment/trim force
        the float path; the collate quantizes)."""
        s = self.samples[idx]
        if pcm16 and self.augmentor is None and not self.trim_silence:
            from conformer_nemo_tpu.data.audio_io import load_audio_pcm16

            audio = load_audio_pcm16(
                s.audio_file, target_sr=self.sample_rate, offset=s.offset,
                duration=s.duration,
            )
            return audio, self.encode_text(s), s.text
        audio = load_audio(
            s.audio_file, target_sr=self.sample_rate, offset=s.offset,
            duration=s.duration, trim=self.trim_silence,
        )
        if self.augmentor is not None:
            audio = self.augmentor.perturb(audio, self.sample_rate, rng=rng)
        tokens = self.encode_text(s)
        return audio, tokens, s.text


class BucketedLoader:
    """Epoch iterator yielding static-shape Batches, sharded across hosts."""

    def __init__(
        self,
        dataset: BucketedAudioTextDataset,
        batch_size: int,
        *,
        shuffle: bool = True,
        seed: int = 0,
        drop_last: bool = False,
        process_index: int = 0,
        process_count: int = 1,
        bucketing_strategy: str = "synced_randomized",
        pad_id: int = 0,
        bucketing_batch_size=None,
        num_workers: int = 0,
        prefetch_batches: int = 2,
        pcm16: bool = False,
        transport: Optional[str] = None,
    ):
        """bucketing_batch_size: per-bucket batch sizes (reference
        calc_bucketing_batch_sizes, audio_to_text_dataset.py:405): an int
        (scale factor against the longest bucket — shorter buckets get
        proportionally larger batches) or an explicit list per bucket.

        num_workers: decode/augment parallelism (reference DataLoader
        `num_workers`, configs/conformer_ctc_bpe.yaml:12). 0 = synchronous
        in-caller decode. >0 = a ThreadPoolExecutor decodes items while a
        builder thread collates batches ahead of the consumer, bounded by
        `prefetch_batches` ready batches. Threads (not processes) because the
        hot decode paths — native FLAC via ctypes, numpy resample/convolve —
        release the GIL. Batch ORDER and CONTENT are bit-identical to
        num_workers=0: the epoch plan and per-item augmentation RNG depend
        only on (seed, epoch, index), never on scheduling."""
        self.ds = dataset
        self.batch_size = batch_size
        n_buckets = len(dataset.boundaries)
        if bucketing_batch_size is None:
            self.bucket_batch = [batch_size] * n_buckets
        elif isinstance(bucketing_batch_size, int):
            longest = dataset.boundaries[-1]
            self.bucket_batch = [
                max(1, int(bucketing_batch_size * longest / b)) for b in dataset.boundaries
            ]
        else:
            assert len(bucketing_batch_size) == n_buckets
            self.bucket_batch = [int(x) for x in bucketing_batch_size]
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.process_index = process_index
        self.process_count = process_count
        self.bucketing_strategy = bucketing_strategy
        self.pad_id = pad_id
        self.num_workers = int(num_workers or 0)
        self.prefetch_batches = max(1, int(prefetch_batches))
        # transport: host->device wire format, decoded in the mel frontend
        # (audio/features.py). "f32" = float32; "pcm16" = int16 (halves H2D
        # bytes; lossless for PCM sources); "mulaw8" = int8 mu-law (quarters
        # H2D bytes at ~38 dB SNR — for transport-bound links; feature/WER
        # neutrality measured in tests/test_transport.py). Default f32 —
        # real hosts are rarely H2D-bound; opt in per train_ds config.
        # `pcm16=True` is the original boolean spelling of transport="pcm16".
        transport = transport or ("pcm16" if pcm16 else "f32")
        if transport not in ("f32", "pcm16", "mulaw8"):
            raise ValueError(f"unknown transport {transport!r} "
                             "(expected f32 | pcm16 | mulaw8)")
        self.transport = transport
        self.epoch = 0

    @property
    def pcm16(self) -> bool:
        """True when the wire format is INTEGER (pcm16 OR mulaw8 — int
        sources then skip the float dequant/requant pass in load_item; the
        batch dtype is int16 for pcm16 but int8 for mulaw8, so do not treat
        True as 'wire is int16'). Settable for backward compatibility:
        `loader.pcm16 = True` selects pcm16 transport on a float loader but
        is a no-op on a loader already configured for an integer transport
        (it must not silently downgrade mulaw8 to pcm16)."""
        return self.transport in ("pcm16", "mulaw8")

    @pcm16.setter
    def pcm16(self, value: bool):
        if value:
            if self.transport == "f32":
                self.transport = "pcm16"
        else:
            self.transport = "f32"

    def _plan(self) -> list[tuple[int, list[int]]]:
        """The epoch's batch plan: (bucket, sample indices) in emission order.
        Pure function of (seed, epoch, strategy) — shared by both the serial
        and the worker paths so parallelism cannot change what is emitted.
        Memoized per epoch: __len__ and __iter__ share one construction."""
        if getattr(self, "_plan_cache", None) is not None and self._plan_cache[0] == self.epoch:
            return self._plan_cache[1]
        rng = np.random.RandomState(
            self.seed if self.bucketing_strategy == "synced_randomized" else self.seed + self.epoch
        )
        n = len(self.ds.samples)
        order = np.arange(n)
        if self.shuffle:
            rng.shuffle(order)
        order = order[self.process_index :: self.process_count]

        # Group by bucket, emit batches per bucket as they fill.
        pending: dict[int, list[int]] = {}
        batches: list[tuple[int, list[int]]] = []
        for idx in order:
            b = self.ds.bucket_of[idx]
            pending.setdefault(b, []).append(int(idx))
            if len(pending[b]) == self.bucket_batch[b]:
                batches.append((b, pending.pop(b)))
        if not self.drop_last:
            for b, idxs in pending.items():
                batches.append((b, idxs))
        if self.shuffle:
            rng.shuffle(batches)
        self._plan_cache = (self.epoch, batches)
        return batches

    def __len__(self) -> int:
        """Batches per epoch (for fraction-of-epoch val_check_interval)."""
        return len(self._plan())

    def _item_rng(self, idx: int) -> random.Random:
        """Per-item augmentation stream: a function of (seed, epoch, idx)
        only, so augmented waveforms are identical under any worker count."""
        return random.Random((self.seed * 1000003 + self.epoch) * 1000003 + idx)

    def __iter__(self) -> Iterator[Batch]:
        batches = self._plan()
        if self.num_workers > 0:
            yield from self._iter_workers(batches)
        else:
            for b, idxs in batches:
                items = [
                    self.ds.load_item(i, rng=self._item_rng(i), pcm16=self.pcm16)
                    for i in idxs
                ]
                yield self._collate(b, idxs, items)
        self.epoch += 1

    def _iter_workers(self, batches) -> Iterator[Batch]:
        """Decode items on a thread pool; collate on a builder thread; hand
        finished batches to the consumer through a bounded queue.

        Pipeline (TPU-host shape of the reference's torch DataLoader
        `num_workers`/`pin_memory` stage): at most `prefetch_batches` batches
        sit collated in the queue while `prefetch_batches + 1` batches' items
        are in flight on the pool, so host decode for batch N+1..N+k overlaps
        the device step for batch N (which data/prefetch.py has already
        shipped). Consumer-side `close()` (e.g. max_steps break) sets a stop
        event; the builder drains and exits rather than leaking the epoch."""
        from concurrent.futures import ThreadPoolExecutor

        out: queue.Queue = queue.Queue(maxsize=self.prefetch_batches)
        stop = threading.Event()

        def build():
            try:
                with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
                    inflight = []
                    plan_it = iter(batches)

                    def submit_next():
                        b, idxs = next(plan_it)
                        futs = [
                            pool.submit(self.ds.load_item, i,
                                        rng=self._item_rng(i), pcm16=self.pcm16)
                            for i in idxs
                        ]
                        inflight.append((b, idxs, futs))

                    for _ in range(self.prefetch_batches + 1):
                        try:
                            submit_next()
                        except StopIteration:
                            break
                    while inflight and not stop.is_set():
                        b, idxs, futs = inflight.pop(0)
                        batch = self._collate(b, idxs, [f.result() for f in futs])
                        while not stop.is_set():
                            try:
                                out.put(("batch", batch), timeout=0.1)
                                break
                            except queue.Full:
                                continue
                        try:
                            submit_next()
                        except StopIteration:
                            pass
            except BaseException as e:  # surface worker errors in the consumer
                # retry like the 'done' path: the queue may stay full for
                # minutes while the consumer compiles — dropping the error
                # would leave the consumer blocked on out.get() forever
                while not stop.is_set():
                    try:
                        out.put(("error", e), timeout=0.1)
                        break
                    except queue.Full:
                        continue
                return
            while not stop.is_set():
                try:
                    out.put(("done", None), timeout=0.1)
                    break
                except queue.Full:
                    continue

        builder = threading.Thread(target=build, name="bucketed-loader", daemon=True)
        builder.start()
        try:
            while True:
                kind, payload = out.get()
                if kind == "batch":
                    yield payload
                elif kind == "error":
                    raise payload
                else:
                    break
        finally:
            stop.set()
            try:
                builder.join(timeout=5.0)
            except TypeError:
                pass  # interpreter teardown: threading internals already gone

    def _collate(self, bucket: int, idxs: List[int], items) -> Batch:
        t_cap = self.ds.boundaries[bucket]
        u_cap = self.ds.token_caps[bucket]
        bsz = self.bucket_batch[bucket]  # pad batch dim too: static shapes
        wire_dtype = {"f32": np.float32, "pcm16": np.int16,
                      "mulaw8": np.int8}[self.transport]
        audio = np.zeros((bsz, t_cap), dtype=wire_dtype)
        audio_lens = np.zeros((bsz,), dtype=np.int32)
        tokens = np.full((bsz, u_cap), self.pad_id, dtype=np.int32)
        token_lens = np.zeros((bsz,), dtype=np.int32)
        texts: List[str] = []
        if self.transport == "mulaw8":
            from conformer_nemo_tpu.data.audio_io import mulaw8_encode
        for row, (wav, toks, text) in enumerate(items):
            n = min(len(wav), t_cap)
            if self.transport == "mulaw8":
                audio[row, :n] = mulaw8_encode(wav[:n])
            elif self.transport == "pcm16" and wav.dtype != np.int16:
                audio[row, :n] = np.clip(wav[:n] * 32768.0, -32768, 32767).astype(np.int16)
            else:
                audio[row, :n] = wav[:n]
            audio_lens[row] = n
            toks = (toks or [])[:u_cap]
            tokens[row, : len(toks)] = toks
            token_lens[row] = len(toks)
            texts.append(text)
        texts.extend([""] * (bsz - len(idxs)))
        return Batch(audio, audio_lens, tokens, token_lens, texts)
