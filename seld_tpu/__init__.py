"""seld_tpu — TPU-native Sound Event Localization and Detection framework.

A from-scratch JAX/XLA/Pallas/pjit framework with the capabilities of the
PyTorch reference ``AuroraEchos/Sound-Event-Localization-and-Detection``
(DualQSELD-TCN on L3DAS21 Task 2): real / quaternion / dual-quaternion
SELD-TCN models, STFT featurization, L3DAS21 + DCASE21 metrics, and a
config-file-driven trainer.

Subpackages
-----------
- ``seld_tpu.config``    — typed config + reference-compatible ``SERVER_*.txt`` parser
- ``seld_tpu.ops``       — quaternion / dual-quaternion algebra ops (XLA + Pallas)
- ``seld_tpu.models``    — flax model zoo (SELDModel, TCN blocks, attention)
- ``seld_tpu.data``      — featurization (STFT), labels, normalization, loaders
- ``seld_tpu.metrics``   — L3DAS21 location-sensitive detection + DCASE21 SELD metrics
- ``seld_tpu.training``  — loss, train/eval steps, schedules, checkpointing, trainer
- ``seld_tpu.parallel``  — device mesh + sharding helpers (dp/tp over ICI)
"""

__version__ = "0.1.0"

from seld_tpu.config import SELDConfig, load_config, parse_text_args  # noqa: F401
