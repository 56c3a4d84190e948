"""Input-pipeline throughput bench: images/s at 512^2 vs worker count.

Usage: python tools/bench_loader.py [NUM_FRAMES]
Writes a synthetic 512^2 subject, then measures BatchLoader epochs at
num_workers = 1, 2, 4, 8 (batch 2, the training shape).  The loader must
sustain > 2x the train-step rate (~7.7 steps/s at 129.9 ms/step) to never
stall the TPU — i.e. > ~31 images/s.
"""

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    from gazenerf_tpu.data.h5_dataset import BatchLoader, GazeH5Dataset
    from gazenerf_tpu.data.synthetic import write_synthetic_subject

    d = tempfile.mkdtemp()
    write_synthetic_subject(d, num_frames=n, img_size=512)
    ds = GazeH5Dataset(d, shuffle=False)

    for workers in (1, 2, 4, 8):
        loader = BatchLoader(ds, batch_size=2, num_workers=workers, prefetch=3)
        # warm one epoch (page cache), then time
        for _ in loader:
            pass
        t0 = time.time()
        count = 0
        for batch in loader:
            count += batch["image"].shape[0]
        dt = time.time() - t0
        print(
            f"num_workers={workers}: {count / dt:7.1f} images/s "
            f"({dt / (count / 2) * 1000:.1f} ms/batch)",
            flush=True,
        )


if __name__ == "__main__":
    main()
