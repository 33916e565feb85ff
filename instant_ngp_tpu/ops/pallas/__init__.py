"""Pallas TPU kernels for the hot ops (SURVEY.md §7 step 2).

The pure-JAX implementations in ops/ are the semantic reference; these
kernels implement the same contracts with explicit VMEM staging where the
XLA-compiled path leaves performance on the table. Each kernel has an
interpret-mode parity test against the jnp reference."""
