"""inbed_pose_estimation_tpu: TPU-native multimodal in-bed human pose & shape
estimation framework (JAX / XLA / Pallas / pjit).

A from-scratch TPU-first re-design with the capabilities of the reference
PyTorch system (AnonymousSubmission43/Inbed_pose_estimation): SPIN-style
human-mesh-recovery specialized for in-bed pose under blankets, consuming
RGB + depth + IR + pressure-map modalities and regressing SMPL parameters
with cascaded iterative-error-feedback ResNet-50 regressors, with
SMPLify-in-the-loop fitting.
"""

__version__ = "0.1.0"
