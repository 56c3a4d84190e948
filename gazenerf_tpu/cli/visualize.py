"""``python -m gazenerf_tpu.cli.visualize`` — render GIFs for TRAIN keys.

TPU twin of the reference ``visualize.py`` (reference: visualize.py:50-99,
141-143): the same per-subject fit + 3-GIF flow as ``evaluate``, but
iterating the TRAIN split's keys (``for subject in train_keys:
process(args, subject)``) and always fitting.
"""

from __future__ import annotations

import argparse

from gazenerf_tpu.cli.common import add_common_args
from gazenerf_tpu.cli.evaluate import add_eval_args, run


def main(argv=None) -> int:
    p = argparse.ArgumentParser(
        description="Fit TRAIN subjects + render demo GIFs"
    )
    add_common_args(p)
    add_eval_args(p, default_split="train")
    return run(p.parse_args(argv))


if __name__ == "__main__":
    raise SystemExit(main())
