"""Shape-qualification preflight CLI (VERDICT r4 next-#3).

Thin wrapper over ``thermalporous_tpu.qualify`` — runs a short warmed
Newton ramp of a case on the current accelerator AND on a CPU reference
subprocess, compares Newton/FGMRES counts, and prints PASS/FAIL.  This is
the mechanized form of the CLAUDE.md rule "validate any NEW grid shape at
scale against CPU counts before trusting it" (sixth axon miscompile
family, BASELINE.md round-4).

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python tools/qualify_shape.py \
      [--case tp_spe10_full] [--nz 128] [--steps 4] [--dt0 300]

Exit code 0 = PASS, 1 = FAIL (counts diverge from the CPU reference).
Expected ledger reproduction: ``--case tp_spe10_padded --nz 128`` FAILS
on axon; ``--case tp_spe10_full`` passes.
"""

import sys

from thermalporous_tpu.qualify import _main

if __name__ == "__main__":
    sys.exit(_main(sys.argv[1:]))
