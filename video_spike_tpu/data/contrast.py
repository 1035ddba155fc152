"""Frame-level contrastive dataset over cached whisker-video features.

Capability parity with ``/root/reference/src/loader/contrast.py:9-115`` and
``load_h5_file`` (``/root/reference/src/utils/dataset_utils.py:7-47``):

- ``pretrain`` mode concatenates the train/val/test splits, flattens trials
  to frames, sorts by timestamp, and yields ``{ref, pos, neg}`` with the
  positive drawn uniformly within ±``idx_offset`` frames (or ``time_offset``
  seconds) and the negative uniformly excluding the reference index;
- ``train``/``val``/``test`` modes yield per-trial ``{ref, neural}`` pairs.

TPU-first: frames stay uint8 on the host; resize + (x/255 - .5)/.5
normalization runs on device inside the jitted step
(:func:`device_frame_transform`), so H2D moves 4x fewer bytes than the
reference's CPU-side torchvision pipeline.
"""

from __future__ import annotations

from typing import Dict, Iterator, Optional

import numpy as np

import jax
import jax.numpy as jnp


def load_h5_file(file_path: str, eid: Optional[str] = None) -> Dict:
    """Load the cached whisker-video h5 into per-eid split dicts."""
    import h5py
    if isinstance(eid, str):
        eids = [eid]
    with h5py.File(file_path, "r") as f:
        if eid is None:
            eids = list(f.keys())
        out = {}
        for e in eids:
            grp = f[e]
            entry = {}
            for split in ("train", "test", "val"):
                entry[f"{split}_X"] = grp[f"X_{split}"][()]
                entry[f"{split}_y"] = grp[f"y_{split}"][()]
                entry[f"{split}_timestamp"] = grp[f"timestamp_{split}"][()]
            out[e] = entry
    return out


class ContrastDataset:
    """Frame dataset with temporal positive sampling."""

    def __init__(self, data_dict: Dict, mode: str,
                 image_size: int = 144, idx_offset: int = 10,
                 time_offset: Optional[float] = None, seed: int = 0):
        assert mode in ("pretrain", "train", "val", "test"), mode
        self.mode = mode
        self.image_size = image_size
        self.idx_offset = idx_offset
        self.time_offset = time_offset
        self.seed = seed
        self.rng = np.random.default_rng(seed)
        self._epoch = 0

        if mode == "pretrain":
            video = np.concatenate([data_dict["train_X"], data_dict["val_X"],
                                    data_dict["test_X"]], axis=0)
            n, t, c, h, w = video.shape
            video = video.reshape(n * t, c, h, w)
            ts = np.concatenate([data_dict["train_timestamp"],
                                 data_dict["val_timestamp"],
                                 data_dict["test_timestamp"]],
                                axis=0).reshape(-1)
            order = np.argsort(ts)
            self.video = np.ascontiguousarray(video[order])
            self.timestamp = ts[order]
            self.labels = None
        else:
            self.video = np.asarray(data_dict[f"{mode}_X"])
            self.labels = np.asarray(data_dict[f"{mode}_y"])
            self.timestamp = np.asarray(data_dict[f"{mode}_timestamp"])
        self.num_frames = self.video.shape[0]

    def __len__(self) -> int:
        return len(self.video)

    # -- index sampling (reference `_select_pos_idx` / `_select_neg_idx`) ---
    def _pos_idx(self, idx: np.ndarray,
                 rng: Optional[np.random.Generator] = None) -> np.ndarray:
        rng = self.rng if rng is None else rng
        if self.time_offset is None:
            start = np.maximum(0, idx - self.idx_offset)
            end = np.minimum(self.num_frames, idx + self.idx_offset + 1)
            return rng.uniform(start, end).astype(np.int64)
        ts = self.timestamp
        out = np.empty_like(idx)
        for i, j in enumerate(idx):
            valid = np.where(np.abs(ts - ts[j]) <= self.time_offset)[0]
            out[i] = rng.choice(valid) if valid.size else j
        return out

    def _neg_idx(self, idx: np.ndarray,
                 rng: Optional[np.random.Generator] = None) -> np.ndarray:
        rng = self.rng if rng is None else rng
        neg = rng.integers(0, self.num_frames, size=idx.shape)
        clash = neg == idx
        while np.any(clash):
            neg[clash] = rng.integers(0, self.num_frames,
                                      size=int(clash.sum()))
            clash = neg == idx
        return neg

    # -- sampler checkpointing (mid-epoch resume) ---------------------------
    def sampler_state(self) -> Dict:
        """JSON-serializable snapshot of the sampling stream: the numpy
        Generator's bit-generator state (PCG64 ints are arbitrary-precision,
        JSON-safe in Python) plus the multihost epoch counter. Capture it
        BEFORE an epoch's ``iter_batches`` call and :meth:`set_sampler_state`
        + ``skip=`` replays that epoch's batch stream exactly."""
        return {"rng_state": self.rng.bit_generator.state,
                "epoch": self._epoch}

    def set_sampler_state(self, state: Dict,
                          restore_rng: bool = True) -> None:
        if restore_rng:
            self.rng.bit_generator.state = state["rng_state"]
        self._epoch = int(state["epoch"])

    # -- batching ------------------------------------------------------------
    def iter_index_batches(self, batch_size: int, shuffle: bool = True,
                           rank: int = 0, world: int = 1,
                           skip: int = 0) -> Iterator[Dict[str, np.ndarray]]:
        """Like :meth:`iter_batches` but yields frame INDICES instead of
        frames — the HBM frame cache's input (the trainer gathers rows on
        device, so per-step H2D is a few KB of int32 instead of MBs of
        video). Draws from the same rng stream in the same order, so
        sampler snapshots/skip replay identically across both forms.

        Single-process draws come from the stateful ``self.rng`` stream
        (snapshot/skip replay). Multi-process (``world > 1``) draws are
        STATELESS: each batch's pos/neg rng is derived from the counter
        tuple ``(seed, epoch, rank, batch position)``, so a mid-epoch
        resume on any rank reproduces the remaining draws exactly without
        per-rank rng state in the sidecar — the draw-exact equivalent of
        the DDP sampler semantics behind the reference's
        ``accelerate launch`` (``/root/reference/src/pretrain.py:51-57``)."""
        order = np.arange(len(self))
        epoch_used = self._epoch
        if shuffle:
            if world > 1:
                epoch_rng = np.random.default_rng((self.seed, self._epoch))
                epoch_rng.shuffle(order)
                self._epoch += 1
            else:
                self.rng.shuffle(order)
        if world > 1:
            order = order[rank::world]
        for bi, s in enumerate(range(0, len(order), batch_size)):
            idx = order[s:s + batch_size]
            if skip > 0:
                skip -= 1
                if self.mode == "pretrain" and world == 1:
                    # single-process fast-forward: consume the skipped
                    # batches' draws so the stateful stream stays
                    # bit-aligned with the original epoch (counter-derived
                    # multi-process draws need no consumption)
                    self._pos_idx(idx)
                    self._neg_idx(idx)
                continue
            if self.mode == "pretrain":
                rng = (np.random.default_rng(
                    (self.seed, epoch_used, rank, bi)) if world > 1 else None)
                yield {"ref": idx, "pos": self._pos_idx(idx, rng),
                       "neg": self._neg_idx(idx, rng)}
            else:
                yield {"ref": idx}

    def iter_batches(self, batch_size: int, shuffle: bool = True,
                     rank: int = 0, world: int = 1,
                     skip: int = 0) -> Iterator[Dict[str, np.ndarray]]:
        """``rank``/``world`` stride the shuffled frame order across
        processes (the DDP DistributedSampler contract the reference's
        ``accelerate launch`` relies on): every rank derives the SAME
        permutation from (seed, epoch) — never from ``self.rng``, whose
        state diverges per rank through the pos/neg draws — takes
        ``order[rank::world]``, and still samples positives/negatives from
        the FULL frame array, so temporal ±offset neighborhoods survive
        sharding."""
        for ib in self.iter_index_batches(batch_size, shuffle=shuffle,
                                          rank=rank, world=world, skip=skip):
            if self.mode == "pretrain":
                yield {"ref": self.video[ib["ref"]],
                       "pos": self.video[ib["pos"]],
                       "neg": self.video[ib["neg"]]}
            else:
                yield {"ref": self.video[ib["ref"]],
                       "neural": self.labels[ib["ref"]]}


def make_contrast_loader(dataset_path: str, mode: str = "pretrain",
                         eid: Optional[str] = None, batch_size: int = 512,
                         shuffle: bool = True, idx_offset: int = 4,
                         time_offset: Optional[float] = None,
                         image_size: int = 144, seed: int = 0):
    """(loader, 1) factory; parity with ``/root/reference/src/loader/
    make.py:33-59``. The loader is a lightweight re-iterable view."""
    data = load_h5_file(dataset_path, eid)
    key = eid if eid is not None else next(iter(data))
    dataset = ContrastDataset(data[key], mode=mode, image_size=image_size,
                              idx_offset=idx_offset, time_offset=time_offset,
                              seed=seed)

    class _Loader:
        def __init__(self, ds):
            self.dataset = ds
            self.batch_size = batch_size  # live: the sharded SSL trainer
            # scales this to batch x data-axis (per-device batch semantics)
            self.shuffle = shuffle  # read by the multi-host epoch sampler

        def __iter__(self):
            return dataset.iter_batches(self.batch_size, shuffle=shuffle)

        def __len__(self):
            return (len(dataset) + self.batch_size - 1) // self.batch_size

    return _Loader(dataset), 1


def device_frame_transform(frames: jax.Array, image_size: int = 144,
                           normalize: bool = True) -> jax.Array:
    """uint8 (B, C, H, W) frames -> resized, normalized f32 on device.

    Equivalent of the reference's torchvision Resize(144) +
    Normalize(0.5, 0.5) on /255 inputs (``/root/reference/src/
    pretrain.py:60-66``), fused into the jitted step.
    """
    x = frames.astype(jnp.float32) / 255.0
    b, c, h, w = x.shape
    if (h, w) != (image_size, image_size):
        x = jax.image.resize(x, (b, c, image_size, image_size),
                             method="linear")
    if normalize:
        x = (x - 0.5) / 0.5
    return x
