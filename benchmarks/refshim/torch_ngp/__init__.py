"""torch_ngp stand-in package (see benchmarks/refshim/README.md)."""
