"""``python -m gazenerf_tpu.cli.visualize`` — render GIFs for training keys.

TPU twin of the reference ``visualize.py`` (reference: visualize.py:50-99),
which is the same flow as ``evaluate.py`` applied to training subjects; we
share the implementation.
"""

from gazenerf_tpu.cli.evaluate import main

if __name__ == "__main__":
    raise SystemExit(main())
