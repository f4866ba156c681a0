"""Thin launcher mirroring the reference's `python main.py ...` entry (main.py:1-233).
The real CLI lives in sparse_vision_tpu/cli.py; `pip install -e .` also provides the
`sparse-vision-tpu` console script."""

from sparse_vision_tpu.cli import _main_entry

if __name__ == "__main__":
    raise SystemExit(_main_entry())
