"""TPU compute ops: distance kernels, beam search, selection, construction."""
