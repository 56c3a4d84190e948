"""HDF5 input pipeline: per-subject files -> device-ready numpy batches.

TPU re-design of the reference torch ``GazeDataset`` + ``DataLoader``
(reference: datasets/eth_xgaze.py:206-433, loaders :69-205).  Differences:

* returns plain numpy dict batches (host-side) that the trainer feeds to the
  jitted train step; a background thread pool prefetches and decodes so the
  TPU never waits on h5py (the reference's DataLoader-workers analogue,
  SURVEY.md §2.8 "async data loading").
* every batch carries the **global sample index** of each element so the
  per-sample latent-offset tables are gathered by stable id (the reference
  indexes offsets by ``iter * batch_size`` which is only stable because its
  loader never reshuffles across epochs — trainer/gazenerf_trainer.py:340).
* the four dataset variants (ETH-XGaze / MPIIFaceGaze / Columbia /
  GazeCapture) differ only in file prefix and index policy
  (diff-verified, SURVEY.md §2.4) — here that is a constructor argument.

Mask erosion matches the reference: head mask eroded twice by a 3x3 kernel
(datasets/eth_xgaze.py:338-339).
"""

from __future__ import annotations

import json
import os
import queue
import threading
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

try:
    import h5py
except ImportError:  # pragma: no cover
    h5py = None

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None

DATASET_PREFIXES = {
    "eth_xgaze": "xgaze_",
    "mpii_face_gaze": "mpii_",
    "columbia": "columbia_",
    "gaze_capture": "gaze_capture_",
}


def _erode2(mask: np.ndarray) -> np.ndarray:
    """3x3 erosion, 2 iterations (reference datasets/eth_xgaze.py:338-339)."""
    if cv2 is not None:
        return cv2.erode(mask, np.ones((3, 3), np.uint8), iterations=2)
    # numpy fallback: min-filter twice
    m = mask.copy()
    for _ in range(2):
        p = np.pad(m, 1, mode="edge")
        windows = [
            p[i : i + m.shape[0], j : j + m.shape[1]] for i in range(3) for j in range(3)
        ]
        m = np.minimum.reduce(windows)
    return m


class GazeH5Dataset:
    """Index over (subject, frame) pairs across per-subject h5 files.

    ``evaluate="target"`` returns (input, target) pairs: the target frame
    index comes from the per-dataset evaluation-target table (reference
    datasets/eth_xgaze.py:280,358-421 loads
    configs/config_files/*_evaluation_target_single_subject.txt and looks it
    up by dataset position).
    """

    def __init__(
        self,
        data_dir: str,
        subjects: Optional[Sequence[str]] = None,
        dataset: str = "eth_xgaze",
        split: str = "train",
        num_val_images: int = 50,
        frames_per_subject: Optional[int] = None,
        shuffle: bool = True,
        seed: int = 0,
        fixed_index: Optional[int] = None,
        evaluate: Optional[str] = None,
        target_index: Optional[Sequence[int]] = None,
        device_decode: bool = False,
    ):
        assert h5py is not None, "h5py required for the HDF5 pipeline"
        self.data_dir = data_dir
        self.dataset = dataset
        self.prefix = DATASET_PREFIXES.get(dataset, "")
        if subjects is None:
            split_file = os.path.join(data_dir, "train_test_split.json")
            if os.path.exists(split_file):
                with open(split_file) as f:
                    subjects = json.load(f)[split]
            else:
                subjects = sorted(
                    f[len(self.prefix):]
                    for f in os.listdir(data_dir)
                    if f.startswith(self.prefix)
                )
        self.subjects = list(subjects)
        self._local = threading.local()
        self.fixed_index = fixed_index
        self.evaluate = evaluate
        # ship image + masks as uint8 and normalize INSIDE the jitted step
        # (train/trainer.py decode_uint8_batch): 4.2x fewer host->device
        # bytes — the H2D payload, not dispatch latency, is what gates
        # loader-fed throughput on a bandwidth-limited device link
        # (PERF_NOTES.md round 4)
        self.device_decode = device_decode

        # Per-dataset index policies (diff-verified against the four
        # reference dataset clones):
        # * ETH-XGaze train: 43*18 frontal frames + the last 7*18 frames in
        #   reverse order (reference datasets/eth_xgaze.py:260-267)
        # * MPII / Columbia / GazeCapture train: the full frame range
        #   (mpii_face_gaze.py:255-263, columbia.py:253-261,
        #   gaze_capture.py:253-261)
        # * val (all datasets): the first ``num_val_images`` frames
        self.index: List[Tuple[int, int]] = []
        for si, s in enumerate(self.subjects):
            with h5py.File(self._path(si), "r") as f:
                n = f["face_patch"].shape[0]
            if split == "val":
                take = list(range(min(num_val_images, n)))
            elif dataset == "eth_xgaze":
                fps = 900 if frames_per_subject is None else frames_per_subject
                if n > fps:
                    front = min(43 * 18, n)
                    back = min(7 * 18, n - front)
                    take = list(range(front)) + list(
                        range(n - 1, n - 1 - back, -1)
                    )
                else:
                    take = list(range(n))
            else:
                take = list(range(n))
            self.index += [(si, i) for i in take]

        if shuffle:
            np.random.default_rng(seed).shuffle(self.index)

        self.target_index = None
        if evaluate == "target":
            if target_index is None:
                from gazenerf_tpu.data.target_indices import TARGET_INDICES

                target_index = TARGET_INDICES[dataset]
            self.target_index = np.asarray(target_index, np.int64)

    def _path(self, subject_idx: int) -> str:
        return os.path.join(self.data_dir, self.prefix + self.subjects[subject_idx])

    def _file(self, subject_idx: int) -> "h5py.File":
        # one handle per (thread, subject): h5py handles are not safe to
        # share across the BatchLoader's worker threads
        files = getattr(self._local, "files", None)
        if files is None:
            files = self._local.files = {}
        f = files.get(subject_idx)
        if f is None:
            f = h5py.File(self._path(subject_idx), "r", swmr=True)
            files[subject_idx] = f
        return f

    def __len__(self) -> int:
        return len(self.index)

    def close(self):
        files = getattr(self._local, "files", None)
        if files:
            for f in files.values():
                f.close()
            files.clear()

    def _read_frame(self, h: "h5py.File", fi: int) -> Dict[str, np.ndarray]:
        img = h["face_patch"][fi][:, :, ::-1]  # BGR->RGB (reference :331)
        head_mask = _erode2(h["head_mask"][fi])
        if self.device_decode:
            # uint8 on the wire; the step computes f32(x)/255 on device
            img = np.ascontiguousarray(img)
            lm_ = np.asarray(h["left_eye_mask"][fi], np.uint8)
            rm_ = np.asarray(h["right_eye_mask"][fi], np.uint8)
            hm_ = head_mask.astype(np.uint8)
        else:
            img = img.astype(np.float32) / 255.0
            lm_ = h["left_eye_mask"][fi].astype(np.float32) / 255.0
            rm_ = h["right_eye_mask"][fi].astype(np.float32) / 255.0
            hm_ = head_mask.astype(np.float32) / 255.0
        sample = {
            "image": img,
            "head_mask": hm_,
            "left_eye_mask": lm_,
            "right_eye_mask": rm_,
            "landmarks": h["facial_landmarks"][fi].astype(np.float32),
            "cam_index": np.asarray(h["cam_index"][fi]).reshape(-1)[:1],
            "pitchyaw": h["pitchyaw_head"][fi].astype(np.float32),
            "head_pose": h["face_head_pose"][fi].astype(np.float32),
            "c2w_Rmat": h["c2w_Rmat"][fi].astype(np.float32),
            "c2w_Tvec": h["c2w_Tvec"][fi].astype(np.float32),
            "w2c_Rmat": h["w2c_Rmat"][fi].astype(np.float32),
            "w2c_Tvec": h["w2c_Tvec"][fi].astype(np.float32),
            "inmat": h["inmat"][fi].astype(np.float32),
        }
        # identity/expr/texture frozen to frame 0, per-frame illumination tail
        # (reference datasets/eth_xgaze.py:346-347)
        code = np.array(h["latent_codes"][0], np.float32)
        code[279:] = h["latent_codes"][fi][279:]
        sample["code"] = code
        return sample

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        if self.fixed_index is not None:
            idx = self.fixed_index
        si, fi = self.index[idx]
        h = self._file(si)
        sample = self._read_frame(h, fi)
        sample["sample_idx"] = np.asarray(idx, np.int64)

        if self.evaluate == "target":
            # target frame in the SAME subject, looked up by dataset position
            # (reference datasets/eth_xgaze.py:358-421)
            ti = int(self.target_index[idx % len(self.target_index)])
            ti = min(ti, h["face_patch"].shape[0] - 1)
            tgt = self._read_frame(h, ti)
            for k, v in tgt.items():
                sample["target_" + k] = v
            sample["target_sample_idx"] = np.asarray(ti, np.int64)
        return sample

    def valid_mask_sample(self, sample: Dict[str, np.ndarray]) -> bool:
        """Degenerate-mask guard (reference trainer/gazenerf_trainer.py:556-567)."""
        hm = sample["head_mask"]
        lm, rm = sample["left_eye_mask"], sample["right_eye_mask"]
        return (hm.max() != hm.min()) and not (
            lm.max() == lm.min() and rm.max() == rm.min()
        )

    def valid_mask_index(self, idx: int) -> bool:
        """Mask-only validity probe for dataset index ``idx`` — reads just the
        three mask frames, so multi-host loaders can agree on the GLOBAL
        skip-batch decision without decoding rows that belong to other
        processes."""
        if self.fixed_index is not None:
            idx = self.fixed_index
        si, fi = self.index[idx]
        h = self._file(si)
        # probe the ERODED head mask — the same tensor valid_mask_sample sees
        # (reference erodes before the degeneracy check,
        # datasets/eth_xgaze.py:338-339).  A raw-nonconstant mask that erodes
        # to constant must produce the SAME verdict on every process, or
        # sharded loaders diverge in batch schedule and the collectives hang.
        hm = _erode2(np.asarray(h["head_mask"][fi]))
        lm = h["left_eye_mask"][fi]
        rm = h["right_eye_mask"][fi]
        return (hm.max() != hm.min()) and not (
            lm.max() == lm.min() and rm.max() == rm.min()
        )


def _collate(samples: List[Dict[str, np.ndarray]]) -> Dict[str, np.ndarray]:
    return {k: np.stack([s[k] for s in samples]) for k in samples[0]}


class BatchLoader:
    """Multi-worker prefetching batch iterator over a :class:`GazeH5Dataset`.

    The reference's DataLoader-workers analogue (reference
    datasets/eth_xgaze.py:109): ``num_workers`` threads decode samples
    concurrently (h5py read + BGR flip + erosion + float conversion all
    release the GIL), batches are collated in submission order, and up to
    ``prefetch`` collated batches sit ready ahead of the consumer.

    Skips batches that contain degenerate masks (matching the reference's
    per-batch guard) when ``skip_invalid`` is set.
    """

    def __init__(
        self,
        dataset: GazeH5Dataset,
        batch_size: int,
        num_workers: int = 2,
        prefetch: int = 2,
        drop_last: bool = True,
        skip_invalid: bool = True,
        process_shard: Optional[Tuple[int, int]] = None,
    ):
        self.ds = dataset
        self.batch_size = batch_size
        self.num_workers = max(1, num_workers)
        self.prefetch = max(1, prefetch)
        self.drop_last = drop_last
        self.skip_invalid = skip_invalid
        # multi-host data parallelism: (process_id, num_processes).  Every
        # process enumerates the SAME global batch schedule (same dataset
        # order, same batch boundaries — ``batch_size`` stays the GLOBAL
        # batch) but decodes only its contiguous row slice; the trainer
        # reassembles the global array from the local shards via
        # ``jax.make_array_from_process_local_data``.  Requires
        # batch_size % num_processes == 0.
        self.process_shard = process_shard
        if process_shard is not None:
            pid, nproc = process_shard
            assert 0 <= pid < nproc, process_shard
            assert batch_size % nproc == 0, (batch_size, nproc)
            assert drop_last, "process_shard requires full (divisible) batches"

    def __len__(self) -> int:
        n = len(self.ds) // self.batch_size
        if not self.drop_last and len(self.ds) % self.batch_size:
            n += 1
        return n

    def _local_rows(self, batch_indices: List[int]) -> List[int]:
        """This process's contiguous slice of a global batch's dataset rows."""
        if self.process_shard is None:
            return batch_indices
        pid, nproc = self.process_shard
        per = self.batch_size // nproc
        return batch_indices[pid * per : (pid + 1) * per]

    def _batch_valid(self, global_indices, samples) -> bool:
        """Degenerate-mask guard.  Sharded loaders must reach the skip
        decision from the GLOBAL batch (identically on every process), so the
        rows other processes decode are probed mask-only."""
        if self.process_shard is None:
            return all(self.ds.valid_mask_sample(s) for s in samples)
        by_row = dict(zip(self._local_rows(global_indices), samples))
        return all(
            self.ds.valid_mask_sample(by_row[i])
            if i in by_row
            else self.ds.valid_mask_index(i)
            for i in global_indices
        )

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        n = len(self.ds)
        batches = [
            list(range(i, min(i + self.batch_size, n)))
            for i in range(0, n, self.batch_size)
        ]
        if self.drop_last:
            batches = [b for b in batches if len(b) == self.batch_size]

        from concurrent.futures import ThreadPoolExecutor

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def collator(pool):
            # per-sample decode fans out across the pool; batches complete
            # in order so downstream sample_idx -> offset-table mapping is
            # deterministic.  In-flight work is bounded so an epoch never
            # buffers more than a few batches ahead of the consumer.
            import collections

            from concurrent.futures import CancelledError

            try:
                inflight: "collections.deque" = collections.deque()
                bi = 0
                while bi < len(batches) or inflight:
                    while bi < len(batches) and len(inflight) < self.prefetch + 2:
                        try:
                            futs = [
                                pool.submit(self.ds.__getitem__, i)
                                for i in self._local_rows(batches[bi])
                            ]
                        except RuntimeError:
                            # pool shut down: the consumer abandoned the
                            # epoch between our stop-check and this submit
                            return
                        inflight.append((batches[bi], futs))
                        bi += 1
                    gi, futs = inflight.popleft()
                    if stop.is_set():
                        return
                    try:
                        samples = [f.result() for f in futs]
                    except CancelledError:
                        # consumer abandoned the epoch mid-flight: the pool
                        # shutdown cancels queued decodes — a clean exit, not
                        # an error to surface through the thread excepthook
                        return
                    if self.skip_invalid and not self._batch_valid(gi, samples):
                        continue
                    while not stop.is_set():
                        try:
                            q.put(_collate(samples), timeout=0.1)
                            break
                        except queue.Full:
                            continue
            finally:
                while not stop.is_set():
                    try:
                        q.put(None, timeout=0.1)
                        break
                    except queue.Full:
                        continue

        pool = ThreadPoolExecutor(max_workers=self.num_workers)
        t = threading.Thread(target=collator, args=(pool,), daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    return
                yield item
        finally:
            stop.set()
            pool.shutdown(wait=False, cancel_futures=True)


def stack_batches(loader, k: int):
    """Group ``k`` consecutive batches into one stacked dict (new leading
    axis ``k``) for multi-step dispatch.

    Through a high-latency device link, dispatching one jitted step per batch
    leaves the chip idle between dispatches; stacking ``k`` host batches into
    a single transfer + a single ``lax.scan``-of-``k``-steps dispatch
    amortizes that latency (PERF_NOTES.md "measurement rules").  The trailing
    ``len % k`` batches are yielded unstacked so no sample is dropped.

    Yields ``(batch_dict, n)`` where ``n`` is the number of training batches
    the dict holds: ``n == k`` means a stacked dict, ``n == 1`` a plain one.
    """
    buf: List[Dict[str, np.ndarray]] = []
    for b in loader:
        buf.append(b)
        if len(buf) == k:
            yield {key: np.stack([bb[key] for bb in buf]) for key in buf[0]}, k
            buf = []
    for b in buf:
        yield b, 1


def device_prefetch(loader, to_device=None, size: int = 3):
    """Background-thread host->device transfer: upload batches i+1..i+size
    while the consumer computes on batch i (SURVEY.md §2.8
    async-data-loading row — the ``jax.device_put`` side of the pipeline).

    The uploads MUST run off the consumer thread: on a bandwidth-limited
    device link ``device_put`` blocks for the transfer, and an in-thread
    "prefetch" serializes transfer and compute (measured 135 -> ~105
    ms/batch at full size, PERF_NOTES.md round 4).

    ``to_device`` maps a numpy batch dict to device arrays; defaults to
    ``jnp.asarray`` per leaf.
    """
    import jax.numpy as jnp

    if to_device is None:
        to_device = lambda b: {k: jnp.asarray(v) for k, v in b.items()}  # noqa: E731

    q: "queue.Queue" = queue.Queue(maxsize=max(1, size))
    stop = threading.Event()
    DONE = object()

    def uploader():
        try:
            for b in loader:
                item = (to_device(b), None)
                while not stop.is_set():
                    try:
                        q.put(item, timeout=0.1)
                        break
                    except queue.Full:
                        continue
                if stop.is_set():
                    return
            tail = (DONE, None)
        except BaseException as e:  # surface loader/transfer errors
            tail = (DONE, e)
        while not stop.is_set():
            try:
                q.put(tail, timeout=0.1)
                return
            except queue.Full:
                continue

    t = threading.Thread(target=uploader, daemon=True)
    t.start()
    try:
        while True:
            item, err = q.get()
            if item is DONE:
                if err is not None:
                    raise err
                return
            yield item
    finally:
        stop.set()
