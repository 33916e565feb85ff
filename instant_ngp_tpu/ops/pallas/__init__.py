"""Pallas TPU kernels — and a measured account of where Pallas does NOT
help on this hardware.

What lives here:
- mlp_kernels.py: fused 64-wide MLP forward (inference fast path).

What deliberately does NOT live here (round 2 finding): hash-grid
encode/scatter kernels. Two generations of VMEM-resident-table grid
kernels were built and benchmarked; both are unbuildable or unprofitable
on TPU v5e:

1. Mosaic's `tpu.dynamic_gather` cannot index across vector registers
   ("Not implemented: Multiple source vregs along gather dimension", —
   observed compiling on real v5e hardware), so a kernel cannot randomly
   address a >1024-entry VMEM table at all. Every "stage the table in
   VMEM and gather locally" design is dead on arrival.
2. XLA's own gather/scatter already runs at the DMA-descriptor issue
   rate (~110-160M descriptors/s measured on v5e, independent of row
   width up to 128 lanes). That rate is set by the memory system, not by
   XLA codegen — a Pallas kernel issuing per-element DMAs is strictly
   slower.

The performance lever that actually works is reducing DESCRIPTOR COUNT,
which is an encoding-layout question, not a kernel question: see
ops/grid_encoding.py `packed` (both features of an entry bit-packed as
bf16 into one f32 word → one descriptor per (sample, level, corner),
exact fp32 scatter-add gradients via custom VJP).
"""
