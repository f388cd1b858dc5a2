"""Shim: the LMDB builder CLI moved into the package
(iisan_tpu/tools/build_lmdb.py; installed as ``iisan-tpu-build-lmdb``).
"""

import sys

sys.path.insert(0, ".")

from iisan_tpu.tools.build_lmdb import main

if __name__ == "__main__":
    main()
