"""Shared geometry constants for the fused Pallas TPU kernels.

BB (pair-block lane width) and the scoped-VMEM budget were triplicated
across pallas_mle / pallas_jmle / pallas_stats and could drift
independently — the 16 MiB scoped ceiling and the 15.25M grantable
limit were discovered the hard way (CLAUDE.md: asking CompilerParams
for more CRASHES the AOT compile helper) and must be re-tuned in ONE
place.  Each kernel keeps its own _vmem_need/pick_geometry because the
working-set formulas genuinely differ.
"""

BB = 128                 # pair-block lane width (vreg lane count)

# Scoped-VMEM ceiling on this target is 16 MiB; leave headroom for the
# compiler's own scratch (15.25M grantable measured on real TPU).
VMEM_BUDGET = 15 * 1024 * 1024 + 512 * 1024
