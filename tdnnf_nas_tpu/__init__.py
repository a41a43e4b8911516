"""tdnnf_nas_tpu — TPU-native LF-MMI acoustic-model training + NAS framework.

A from-scratch JAX/XLA/Pallas/pjit re-design of the capabilities of the
Kaldi-based reference `skhu101/TDNN-F_NAS` (TASLP 2022, arXiv:2201.03943):

- fbank/MFCC feature frontend (``frontend``)
- chain (LF-MMI) graph machinery: HMM topology, phone LM, denominator graph,
  numerator supervision (``graphs``)
- scaled-probability / log-semiring forward-backward ops (``ops.fwdbwd``)
- factored TDNN (TDNN-F) models with semi-orthogonal constraint (``models``)
- DARTS-style differentiable architecture search over per-layer context
  offsets and bottleneck dims (``nas``)
- jitted LF-MMI trainer with data-parallel `pjit` scaling (``train``,
  ``parallel``)
- decoding + WER scoring (``decode``)

The compute path is pure JAX (MXU-friendly dense ops, static shapes,
`lax.scan` control flow); graph construction is host-side numpy.
"""

__version__ = "0.1.0"
