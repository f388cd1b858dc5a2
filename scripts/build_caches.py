"""Shim: the cache builder CLI moved into the package
(iisan_tpu/tools/build_caches.py; installed as ``iisan-tpu-build-caches``).
"""

import sys

sys.path.insert(0, ".")

from iisan_tpu.tools.build_caches import main

if __name__ == "__main__":
    main()
