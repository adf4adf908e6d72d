"""Native host-ops: C++ kernels for the host data path, ctypes-loaded.

Auto-builds libhostops.so on first import (g++ -O3 -fopenmp); every entry
point has a numpy fallback, so the framework works without a compiler.
Use `from humannerf_tpu.native import hostops; hostops.available()`.
"""

from humannerf_tpu.native import hostops  # noqa: F401
