"""Native C++17 host engine (reference C-ABI parity layer).

``hnsw_host.cpp`` ships with the package and is compiled on demand by
``host_engine.py`` (g++) when no prebuilt ``libhnswhost.so`` is present —
the wheel stays pure-Python/portable while the native engine remains one
import away on any host with a C++ toolchain."""
