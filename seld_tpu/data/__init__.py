"""Data subsystem: featurization, labels, normalization, loading, fixtures."""

from seld_tpu.data.features import spectrum_fast, stft_frames  # noqa: F401
from seld_tpu.data.labels import (  # noqa: F401
    csv_to_matrix_task2,
    segment_task2,
    segment_waveforms,
)
from seld_tpu.data.normalize import normalize_dataset  # noqa: F401
from seld_tpu.data.loader import BatchIterator, load_task2_pickles  # noqa: F401
from seld_tpu.data.synthetic import (  # noqa: F401
    gen_dummy_seld_results,
    gen_dummy_waveforms,
    gen_fake_task2_dataset,
    gen_seld_out,
)
