"""TPU compute primitives: MAS, attention helpers, DSP, pitch, GRL."""
