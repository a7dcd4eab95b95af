"""Data loaders: transform pipeline tail + device placement.

Capability parity with lihzha/lap ``datasets/data_loader.py``: per-sample
python transforms applied to raw frames, restacked into batches, placed onto
the mesh with the batch dim sharded over (dp, fsdp); infinite train iterator;
batch-divisibility checks; norm-stats hand-off; dataloader state
checkpointing (batches seen -> skip on resume).

The RLDS path reads TFRecord shards with the pure-Python reader
(lap_tpu.data.rlds); the ``fake`` repo_id generates synthetic robot samples
for tests/debug (reference data_loader.py:69 semantics).
"""

from __future__ import annotations

import dataclasses
import logging
import queue
import threading
from collections.abc import Iterator

import jax
import numpy as np

from lap_tpu.models.types import CoTObservation
from lap_tpu.parallel import data_sharding

logger = logging.getLogger(__name__)


class FakeRawDataset:
    """Synthetic robot samples shaped like the RLDS pipeline output."""

    def __init__(self, *, resolution=(224, 224), action_dim=7, action_horizon=4, seed=0, num_samples=256):
        self._res = resolution
        self._action_dim = action_dim
        self._horizon = action_horizon
        self._num = num_samples
        self._seed = seed

    def __len__(self):
        return self._num

    def __getitem__(self, idx: int) -> dict:
        rng = np.random.default_rng(self._seed * 100_003 + idx)
        h, w = self._res
        img = rng.integers(0, 255, (h, w, 3), np.uint8)
        wrist = rng.integers(0, 255, (h, w, 3), np.uint8)
        la = np.zeros(7, np.float32)
        la[:3] = rng.uniform(-0.05, 0.05, 3)
        la[3:6] = rng.uniform(-0.3, 0.3, 3)
        la[6] = float(rng.random() > 0.5)
        return {
            "observation": {
                "base_0_rgb": img,
                "left_wrist_0_rgb": wrist,
                "state": rng.uniform(-1, 1, self._action_dim).astype(np.float32),
            },
            "prompt": "pick up the object",
            "dataset_name": "fake",
            "actions": rng.uniform(-1, 1, (self._horizon, self._action_dim)).astype(np.float32),
            "raw_state": np.concatenate(
                [rng.uniform(-0.5, 0.5, 3), [1, 0, 0, 0, 1, 0], [0.5]]
            ).astype(np.float32),
            "language_actions": la,
            "has_wrist_image": True,
        }


@dataclasses.dataclass
class TransformedDataLoader:
    """Applies the per-sample transform chain, stacks, and device-puts.

    The transform tail runs in a background thread pool so host preprocessing
    overlaps device compute (replacing the reference's tf.data prefetching).
    """

    dataset: object  # indexable raw dataset
    transforms: list  # per-sample callables
    batch_size: int
    mesh: object | None = None
    seed: int = 0
    shuffle: bool = True
    drop_remainder: bool = True
    prefetch: int = 2
    num_threads: int = 8
    max_samples: int | None = None

    def __post_init__(self):
        self._norm_stats = None
        self._batches_seen = 0

    # -- norm stats hand-off (for checkpoint assets) -------------------------
    @property
    def norm_stats(self):
        return self._norm_stats

    def set_norm_stats(self, stats):
        self._norm_stats = stats

    # -- dataloader state checkpointing --------------------------------------
    def state_dict(self) -> dict:
        return {"batches_seen": self._batches_seen, "seed": self.seed}

    def load_state_dict(self, state: dict):
        self._batches_seen = int(state.get("batches_seen", 0))

    def _transform(self, sample: dict) -> dict:
        for t in self.transforms:
            sample = t(sample)
        return sample

    def _sample_indices(self, epoch: int) -> np.ndarray:
        n = len(self.dataset)
        if self.max_samples is not None:
            n = min(n, self.max_samples)
        idx = np.arange(n)
        if self.shuffle:
            rng = np.random.default_rng(self.seed * 7919 + epoch)
            rng.shuffle(idx)
        # Multi-host: the shuffle is seed-identical on every process, so a
        # strided slice gives each process a disjoint part of the same global
        # permutation (iterable datasets shard at the RLDS reader instead).
        # Truncate first so every process sees the SAME per-epoch length —
        # otherwise hosts disagree on batches_per_epoch and resume diverges.
        n_proc = jax.process_count()
        if n_proc > 1:
            idx = idx[: (len(idx) // n_proc) * n_proc]
            idx = idx[jax.process_index()::n_proc]
        return idx

    def __iter__(self) -> Iterator:
        """Infinite iterator over device-placed batches.

        The per-sample transform chain (jpeg decode, resize, aug, tokenize)
        runs on a ``num_threads`` pool — cv2 and numpy release the GIL, so
        host preprocessing scales with cores and overlaps device compute
        (replacing the reference's tf.data parallel maps). Producer errors
        propagate to the consumer instead of hanging it.
        """
        from collections import deque
        from concurrent.futures import ThreadPoolExecutor

        out_q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()
        indexable = hasattr(self.dataset, "__getitem__")
        depth = max(self.num_threads * 4, self.batch_size)

        def raw_indexable():
            # Exact resume: fast-forward to the epoch AND the within-epoch
            # batch offset implied by batches_seen. _sample_indices is a pure
            # function of (seed, epoch), so this reproduces the uninterrupted
            # stream position (reference data_loader.py skip-n semantics).
            batches_per_epoch = max(len(self._sample_indices(0)) // self.batch_size, 1)
            epoch, offset_batches = divmod(self._batches_seen, batches_per_epoch)
            while True:
                indices = self._sample_indices(epoch)
                start0 = offset_batches * self.batch_size
                offset_batches = 0
                for start in range(start0, len(indices) - self.batch_size + 1, self.batch_size):
                    for i in indices[start : start + self.batch_size]:
                        yield self.dataset[int(i)]
                epoch += 1

        def raw_iterable():
            it = iter(self.dataset)
            # Exact resume for iterable (RLDS) datasets: the mixture stream is
            # a pure function of its seeds, so discarding the raw samples that
            # formed the first batches_seen batches reproduces the stream
            # position. Raw samples are skipped WITHOUT running the transform
            # tail (cheap; matches reference dataset.skip(n) semantics).
            skip = self._batches_seen * self.batch_size
            if skip:
                logger.info("dataloader resume: skipping %d raw samples", skip)
                for _ in range(skip):
                    try:
                        next(it)
                    except StopIteration:
                        return
            yield from it

        def put(item) -> bool:
            """Queue put that gives up when the consumer is gone (no leaked
            producer threads parked forever on a full queue)."""
            while not stop.is_set():
                try:
                    out_q.put(item, timeout=0.5)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            try:
                raw_iter = raw_indexable() if indexable else raw_iterable()
                with ThreadPoolExecutor(self.num_threads) as pool:
                    futures: deque = deque()
                    exhausted = False
                    samples = []
                    while True:
                        while not exhausted and len(futures) < depth:
                            try:
                                futures.append(pool.submit(self._transform, next(raw_iter)))
                            except StopIteration:
                                exhausted = True
                        if not futures:
                            break
                        if stop.is_set():
                            return
                        samples.append(futures.popleft().result())
                        if len(samples) == self.batch_size:
                            if not put(jax.tree.map(lambda *xs: np.stack(xs), *samples)):
                                return
                            samples = []
                if samples and not self.drop_remainder:
                    if not put(jax.tree.map(lambda *xs: np.stack(xs), *samples)):
                        return
                put(None)  # exhausted (validation)
            except BaseException as e:  # noqa: BLE001 - surface in the consumer
                put(e)

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        try:
            while True:
                batch = out_q.get()
                if batch is None:  # iterable dataset exhausted
                    return
                if isinstance(batch, BaseException):
                    raise batch
                self._batches_seen += 1
                yield self._to_device(batch)
        finally:
            stop.set()
            # Unblock the producer if it's parked on a full queue.
            while not out_q.empty():
                try:
                    out_q.get_nowait()
                except queue.Empty:
                    break

    def _to_device(self, batch: dict):
        actions = batch.pop("actions", None)
        # Images stay uint8 across the host->device transfer (4x fewer
        # bytes); preprocess_observation converts to [-1, 1] float on device.
        obs = CoTObservation.from_dict(batch, convert_images=False)
        pair = (obs, actions)
        if self.mesh is None:
            return pair
        sharding = data_sharding(self.mesh)
        if jax.process_count() == 1:
            return jax.device_put(pair, sharding)
        # Pod-correct path: every process feeds only ITS slice of the global
        # batch (the RLDS readers are process-sharded); the global array is
        # assembled from per-process local data without any cross-host copy
        # (reference data_loader.py:36,235-246).
        n_proc = jax.process_count()

        def put(x):
            if x is None:
                return None
            x = np.asarray(x)
            global_shape = (x.shape[0] * n_proc, *x.shape[1:])
            return jax.make_array_from_process_local_data(sharding, x, global_shape)

        return jax.tree.map(put, pair)


_BATCH_KEYS = (
    "state",
    "actions",
    "tokenized_prompt",
    "tokenized_prompt_mask",
    "tokenized_langact_mask",
    "token_loss_mask",
    "tokenized_dataset_name",
    "critical_token_mask",
    "number_token_mask",
    "direction_token_mask",
    "sample_mask",
    "is_vqa_sample",
    "is_prediction_sample",
    "vqa_dataset_id",
)


def _keep_batch_fields(sample: dict) -> dict:
    """Final per-sample projection to model fields (drops host-only keys).

    Mixtures are heterogeneous (e.g. datasets without language-action
    supervision emit no langact masks); batch collation needs a uniform
    schema, so optional token masks default to all-False (reference
    output_schema canonicalization).
    """
    out = {"image": sample["image"], "image_mask": sample["image_mask"]}
    for k in _BATCH_KEYS:
        if k in sample and sample[k] is not None:
            out[k] = np.asarray(sample[k])
    if "tokenized_prompt" in out:
        token_shape = np.shape(out["tokenized_prompt"])
        for k in (
            "tokenized_langact_mask",
            "critical_token_mask",
            "number_token_mask",
            "direction_token_mask",
        ):
            if k not in out:
                out[k] = np.zeros(token_shape, dtype=bool)
    return out


def create_data_loader(train_config, mesh=None, *, split: str = "train"):
    """Build the loader for a TrainConfig (reference data_loader.py:126-198)."""
    data_cfg = train_config.data
    model_cfg = train_config.model
    transforms = list(data_cfg.data_transforms(model_cfg).inputs)

    # Normalization between data and model transforms (reference ordering).
    norm_stats = None
    if data_cfg.repo_id == "fake":
        dataset = FakeRawDataset(
            resolution=model_cfg.image_resolution,
            action_dim=model_cfg.action_dim,
            action_horizon=model_cfg.action_horizon,
            seed=train_config.seed,
        )
    else:
        from lap_tpu.data.episode_pipeline import make_image_decoder
        from lap_tpu.data.mixer import build_rlds_dataset

        dataset, norm_stats = build_rlds_dataset(train_config, split=split)
        # Frames cross the shuffle buffer as encoded bytes; decode (+resize,
        # wrist rotation) here so it runs in the loader's thread pool.
        transforms.insert(0, make_image_decoder(data_cfg.resize_resolution))

    if norm_stats is not None:
        from lap_tpu.policies.model_transforms import Normalize

        transforms.append(
            Normalize(norm_stats, normalization_type=data_cfg.action_proprio_normalization_type)
        )
    transforms.extend(data_cfg.model_transforms(model_cfg, include_outputs=False).inputs)
    transforms.append(_keep_batch_fields)

    # Each process loads only its slice of the global batch; the loader
    # reassembles the global array from per-process local data.
    n_proc = jax.process_count()
    if train_config.batch_size % n_proc != 0:
        raise ValueError(
            f"batch_size {train_config.batch_size} not divisible by "
            f"process_count {n_proc}"
        )
    loader = TransformedDataLoader(
        dataset=dataset,
        transforms=transforms,
        batch_size=train_config.batch_size // n_proc,
        mesh=mesh,
        seed=train_config.seed,
        shuffle=split == "train",
        max_samples=data_cfg.max_samples,
    )
    loader.set_norm_stats(norm_stats)
    return loader
