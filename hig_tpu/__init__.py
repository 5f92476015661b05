"""hig_tpu — a TPU-native framework for role-aware human interaction generation.

A ground-up JAX/Flax/Pallas rebuild of the capabilities of
line/Human-Interaction-Generation (Tanaka & Fujiwara, ICCV 2023): a
text-conditioned two-person motion diffusion model with cross-actor
interaction attention, the PIT role-discovery pipeline, the HumanML3D-style
263-d motion feature codec, the evaluation stack (Accuracy / FID /
Consistency / Diversity / MultiModality), visualization, and SMPL fitting.

Layer map (mirrors SURVEY.md §1, re-architected TPU-first):

  L0 geometry .......... hig_tpu.utils      (quaternions, skeleton FK/IK, codec)
  L1 data pipeline ..... hig_tpu.data       (NTU dataset, windowing, synthetic)
  L2 model zoo ......... hig_tpu.models     (denoisers, text encoder, evaluators)
       + hig_tpu.diffusion (schedules, losses, lax.scan samplers)
       + hig_tpu.ops       (Pallas kernels for the attention hot path)
  L3 runtime ........... hig_tpu.train      (jit train step, PIT loss, labeling)
       + hig_tpu.parallel  (device mesh, sharding rules)
  L4 evaluation ........ hig_tpu.eval       (metrics, evaluator harness)
  L5 viz & SMPL ........ hig_tpu.viz, hig_tpu.smpl
  L6 CLIs .............. tools/
  L7 config ............ hig_tpu.config
"""

__version__ = "0.3.0"
