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
    sys.argv = [sys.argv[0]] + argv
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "train_ssl_uem", _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), "train_ssl_uem.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.main()
