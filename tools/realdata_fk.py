"""Food-Kitchen real-data run — back-compat shim over tools/realdata_run.py.

Round 4 grew this file; round 5 generalized it to every mounted dataset
(Movie-Book, train-fraction scaling, extra-split folding, bug-parity
dynamics).  See tools/realdata_run.py for the protocol documentation.

Usage: python tools/realdata_fk.py [--epochs 60] [--raw DIR]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.realdata_run import run as _run  # noqa: E402

FK_RAW = "/root/reference/data/raw/Food-Kitchen"


def run(raw_dir=FK_RAW, n_epochs=60, es_patience=10, out_path=None):
    return _run(data_code="fk", raw_dir=raw_dir, n_epochs=n_epochs,
                es_patience=es_patience, out_path=out_path)


def main():
    kw = {}
    argv = sys.argv[1:]
    for i, a in enumerate(argv):
        if a == "--epochs":
            kw["n_epochs"] = int(argv[i + 1])
        elif a == "--raw":
            kw["raw_dir"] = argv[i + 1]
    run(**kw)


if __name__ == "__main__":
    main()
