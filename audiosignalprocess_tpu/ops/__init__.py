from audiosignalprocess_tpu.ops import (  # noqa: F401
    fft,
    fir,
    overlap_save,
    resample,
    stft,
    windows,
)
