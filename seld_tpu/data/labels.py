"""Offline label building and segmentation for L3DAS21 Task 2.

Host-side (numpy/pandas) equivalents of the reference's offline path:
``csv_to_matrix_task2`` (reference ``utility_functions.py:212-269``),
``segment_task2`` (``utility_functions.py:302-342``) and ``segment_waveforms``
(``utility_functions.py:272-299``). These run once during dataset
preparation, so they stay on host; the hot path (STFT + model) is on-device.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

# canonical 14-class L3DAS21 Task-2 label map (reference metrics.py:108-121)
SOUND_CLASSES_TASK2: Dict[str, int] = {
    "Chink_and_clink": 0,
    "Computer_keyboard": 1,
    "Cupboard_open_or_close": 2,
    "Drawer_open_or_close": 3,
    "Female_speech_and_woman_speaking": 4,
    "Finger_snapping": 5,
    "Keys_jangling": 6,
    "Knock": 7,
    "Laughter": 8,
    "Male_speech_and_man_speaking": 9,
    "Printer": 10,
    "Scissors": 11,
    "Telephone": 12,
    "Writing": 13,
}


def csv_to_matrix_task2(
    path: str,
    class_dict: Dict[str, int] = SOUND_CLASSES_TASK2,
    dur: float = 60,
    step: float = 0.1,
    max_loc_value: float = 2.0,
    no_overlaps: bool = False,
) -> np.ndarray:
    """Build the stacked (frames, sed+doa) target matrix from a label CSV.

    Each 100 ms frame row holds ``classes*overlaps`` detection flags followed
    by ``classes*overlaps*3`` xyz coordinates normalized by ``max_loc_value``.
    Semantics match reference ``utility_functions.py:212-269``: start/end
    times are quantized to ``step`` then mapped through linear interpolation
    onto ``[0, num_frames-1]``, and up to 3 simultaneous events per class are
    written in slot order of appearance.
    """
    import pandas as pd

    max_overlap = 3
    num_frames = int(dur / step)
    num_classes = len(class_dict)
    cl = np.zeros((num_frames, num_classes, max_overlap))
    loc = np.zeros((num_frames, num_classes, max_overlap, 3))

    def quantize(t: float) -> float:
        return round(float(t) / step) * step

    def get_frame(t: float) -> int:
        return int(np.interp(t, (0, dur), (0, num_frames - 1)))

    df = pd.read_csv(path)
    for _, s in df.iterrows():
        start_frame = get_frame(quantize(s["Start"]))
        end_frame = get_frame(quantize(s["End"]))
        class_id = class_dict[s["Class"]]
        for f in range(start_frame, end_frame + 1):
            pos = int(np.sum(cl[f][class_id]))
            cl[f][class_id][pos] = 1.0
            loc[f][class_id][pos] = [s["X"], s["Y"], s["Z"]]

    loc = loc / max_loc_value
    if no_overlaps:
        cl_flat = cl[:, :, 0].reshape(num_frames, num_classes)
        loc_flat = loc[:, :, 0, :].reshape(num_frames, num_classes * 3)
    else:
        cl_flat = cl.reshape(num_frames, num_classes * max_overlap)
        loc_flat = loc.reshape(num_frames, num_classes * max_overlap * 3)
    return np.concatenate([cl_flat, loc_flat], axis=1)


def segment_waveforms(
    predictors: np.ndarray, target: np.ndarray, length: int
) -> Tuple[List[np.ndarray], List[np.ndarray]]:
    """Chunk (channels, samples) waveforms into fixed windows, zero-padding the tail."""

    def pad(x, d):
        out = np.zeros((x.shape[0], d), dtype=x.dtype)
        out[:, : x.shape[-1]] = x
        return out

    cuts = np.arange(0, predictors.shape[-1], length)
    xs, ys = [], []
    for i, start in enumerate(cuts):
        if i != len(cuts) - 1:
            end = cuts[i + 1]
            xs.append(predictors[:, start:end])
            ys.append(target[:, start:end])
        else:
            xs.append(pad(predictors[:, start:], length))
            ys.append(pad(target[:, start:], length))
    return xs, ys


def segment_task2(
    predictors: np.ndarray,
    target: np.ndarray,
    predictors_len_segment: int = 50 * 8,
    target_len_segment: int = 50,
    overlap: float = 0.5,
) -> Tuple[List[np.ndarray], List[np.ndarray]]:
    """Chunk an (C, F, T_stft) feature tensor and its (T_label, feat) target
    into aligned overlapping windows (defaults cut 5-second chunks).
    Matches reference ``utility_functions.py:302-342``.
    """

    def pad3(x, d):
        out = np.zeros((x.shape[0], x.shape[1], d), dtype=x.dtype)
        out[:, :, : x.shape[-1]] = x
        return out

    target = target.reshape(1, target.shape[-1], target.shape[0])
    cuts_p = np.arange(0, predictors.shape[-1], int(predictors_len_segment * overlap))
    cuts_t = np.arange(0, target.shape[-1], int(target_len_segment * overlap))
    if len(cuts_p) != len(cuts_t):
        raise ValueError(
            "Predictors and target cuts must produce the same number of frames"
        )
    xs, ys = [], []
    for start_p, start_t in zip(cuts_p, cuts_t):
        end_p = start_p + predictors_len_segment
        end_t = start_t + target_len_segment
        if end_p <= predictors.shape[-1]:
            cut_x = predictors[:, :, start_p:end_p]
            cut_y = target[:, :, start_t:end_t]
        else:
            cut_x = pad3(predictors[:, :, start_p:], predictors_len_segment)
            cut_y = pad3(target[:, :, start_t:], target_len_segment)
        xs.append(cut_x)
        ys.append(np.reshape(cut_y, (cut_y.shape[-1], cut_y.shape[1])))
    return xs, ys
