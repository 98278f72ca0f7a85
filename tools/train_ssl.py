"""Plain self-training baseline (reference ``tools/train_ssl.py``): same
loop as train_ssl_uem with CE as the default target loss. Kept as a thin
delegating CLI for script-level parity with the reference tool set."""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import sys

if __name__ == "__main__":
    argv = sys.argv[1:]
    if not any(a == "--lt" for a in argv):
        argv += ["--lt", "ce"]
    # reference train_ssl.py:45 defaults --refine-label to 0 (train_ssl_uem
    # defaults it to 1) — preserve that default unless the caller overrides
    if not any(a == "--refine-label" for a in argv):
        argv += ["--refine-label", "0"]
    sys.argv = [sys.argv[0]] + argv
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "train_ssl_uem", _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), "train_ssl_uem.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.main()
