"""Measured dead ends kept as A/B records (VERDICT r4 weak #6).

Every module here is a COMPLETE, tested implementation that lost its
on-chip A/B against the production tier and is retained as the measured
negative result (probe jsonls in bench/results/) and as a hedge against
future backend changes. Nothing in the production chain imports from
this namespace.

  pallas_shift      per-tap shifted-FMA VPU filter tier (r4: VMEM-bound,
                    ~XLA parity at best; Mosaic block-temp-per-offset)
  pallas_deframe    DMA frame extraction AT the frame offset (r4 dead
                    end: dynamic DMA offsets must be 128-aligned — the
                    production kernels/pallas_extract.py over-reads
                    ALIGNED windows and shifts on-chip instead)
  viterbi_variants  state-major and radix-4 two-step ACS decoders (r5:
                    bit-exact, but the production scan wins every batch
                    regime — r5_probe_vit.jsonl)
"""
