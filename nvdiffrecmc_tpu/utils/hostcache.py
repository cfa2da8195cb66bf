"""Host-keyed persistent-compilation-cache paths.

XLA:CPU caches AOT machine code compiled for the *exact* CPU feature set of
the compiling host.  This project's working tree migrates between physical
machines with different CPUs (observed: an avx512/amx host vs a narrower
one); loading an AOT artifact compiled elsewhere trips
`cpu_aot_loader.cc` feature checks and can leave some device threads dead,
after which the next CPU collective rendezvous times out and XLA aborts the
process (seen as `Fatal Python error: Aborted` in the 8-virtual-device
tests).

Every persistent cache dir must therefore be suffixed with a fingerprint of
the host CPU, so a cache written on machine A is simply invisible on
machine B instead of poisoning it.
"""

import hashlib
import platform


def _cpu_fingerprint():
    """Hash of cpuinfo flags AND model identity.  Flags alone are not
    enough: LLVM picks tuning features (e.g. +prefer-no-scatter on some
    Xeon steppings) from the CPU *model*, so two hosts with identical flag
    lists can still produce mutually SIGILL-adjacent AOT artifacts
    (observed: cpu_aot_loader feature-mismatch errors on a cache keyed by
    flags only)."""
    parts = []
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                k = line.split(":", 1)[0].strip()
                if k in ("flags", "Features"):
                    parts.append(" ".join(sorted(line.split(":", 1)[1]
                                                 .split())))
                elif k in ("model name", "cpu family", "model", "stepping",
                           "vendor_id", "CPU implementer", "CPU part"):
                    parts.append(line.split(":", 1)[1].strip())
                if len(parts) >= 6 and k == "flags":
                    break  # first core only; all cores are identical here
    except OSError:
        pass
    ident = "%s|%s" % (platform.machine(), "|".join(parts))
    return hashlib.sha256(ident.encode()).hexdigest()[:10]


def host_cache_dir(base):
    """`base` + a per-host CPU-feature fingerprint suffix."""
    return "%s_%s" % (base, _cpu_fingerprint())
