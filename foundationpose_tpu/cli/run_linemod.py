"""LINEMOD benchmark entry point (reference: run_linemod.py).

Thin alias over the unified BOP driver with dataset pinned to 'lm'.
"""
from .run_bop import main as _main


def main(argv=None):
    argv = list(argv) if argv is not None else None
    import sys

    args = argv if argv is not None else sys.argv[1:]
    if "--dataset" not in " ".join(args):
        args = ["--dataset", "lm"] + list(args)
    _main(args)


if __name__ == "__main__":
    main()
