"""YCB-Video benchmark entry point (reference: run_ycb_video.py).

Thin alias over the unified BOP driver with dataset pinned to 'ycbv'.
"""
from .run_bop import main as _main


def main(argv=None):
    import sys

    args = list(argv) if argv is not None else sys.argv[1:]
    if "--dataset" not in " ".join(args):
        args = ["--dataset", "ycbv"] + list(args)
    _main(args)


if __name__ == "__main__":
    main()
