"""Raw-audio input pipeline (north-star path).

Streams waveform crops -- with CMVN context, see ops/pipeline.py -- straight
from wav.scp entries (plain paths or JSON augmentation specs rendered
on-the-fly, data/augment.py), replacing the reference's offline feature
store + feeder pipes.  Crop-position distribution matches the reference's
feature-domain random crop (tf_data.py:84-101): t0 ~ U[0, n - feat_length]
for long utterances, random zero-pad shift for short ones.

Online augmentation falls out for free: pointing this at a `<ds>_aug`
wav.scp renders reverb/noise mixes per epoch visit on the host CPU pool --
fresher augmentation than the reference's fixed offline copies.
"""

from __future__ import annotations

from typing import Dict, Iterator, Optional, Tuple

import numpy as np

from ..ops.fbank import FbankConfig, num_frames
from ..ops.pipeline import crop_samples, max_crop_samples
from .augment import load_utterance
from ..utils import datadir


class RawAudioShardDataset:
    """Infinite (wave, num_samples, target_offset, pad_shift, label) stream
    over one shard of a wav.scp."""

    def __init__(
        self,
        wav_scp: str,
        utt2id: Dict[str, int],
        feat_length: int,
        *,
        cfg: FbankConfig = FbankConfig(),
        context: int = 150,
        shard_index: int = 0,
        num_shards: int = 1,
        training: bool = True,
        skip_percent: int = 10,
        seed: int = 0,
    ):
        self.entries = list(
            datadir.read_two_column(wav_scp).items()
        )[shard_index::num_shards]
        assert self.entries, (wav_scp, shard_index, num_shards)
        self.utt2id = utt2id
        self.feat_length = feat_length
        self.cfg = cfg
        self.context = context
        self.training = training
        self.skip_percent = skip_percent
        self.rng = np.random.RandomState(seed)
        self.max_samples = max_crop_samples(feat_length, context, cfg)

    def _crop(self, samples: np.ndarray):
        """-> (wave (max_samples,) int16, num_samples, target_offset, pad_shift).

        int16 wire format: halves host->device transfer; the values are
        int16-scale already (augmented mixes are clipped exactly like the
        reference's wav-file round trip), and the device pipeline casts to
        fp32 before the analysis matmuls."""
        samples = np.clip(np.round(samples), -32768, 32767)
        cfg, L = self.cfg, self.feat_length
        n = num_frames(len(samples), cfg)
        out = np.zeros(self.max_samples, np.int16)
        if n >= L:
            t0 = self.rng.randint(n - L + 1)            # ref tf_data.py:99
            lo = max(0, t0 - self.context)
            hi = min(n, t0 + L + self.context)
            s_lo = lo * cfg.frame_shift
            s_hi = min(len(samples), (hi - 1) * cfg.frame_shift + cfg.frame_length)
            crop = samples[s_lo:s_hi]
            out[: len(crop)] = crop
            return out, np.int32(len(crop)), np.int32(t0 - lo), np.int32(0)
        # short utterance: whole thing, random zero-row shift (tf_data.py:92-95)
        shift = self.rng.randint(L - n + 1) if self.training else 0
        out[: len(samples)] = samples
        return out, np.int32(len(samples)), np.int32(0), np.int32(shift)

    def __iter__(self) -> Iterator[Tuple]:
        while True:
            for utt, rxwav in self.entries:
                if self.training and self.rng.randint(0, 100) >= 100 - self.skip_percent:
                    continue  # 10%-skip reshuffle (ref tf_data.py:69)
                samples, sr = load_utterance(rxwav)
                if num_frames(len(samples), self.cfg) < 1:
                    continue
                wave, ns, off, shift = self._crop(samples)
                label = np.int32(self.utt2id[utt]) if self.utt2id else utt
                yield (wave, ns, off, shift), label
            if not self.training:
                return
