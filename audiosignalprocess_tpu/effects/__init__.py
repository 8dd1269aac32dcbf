from audiosignalprocess_tpu.effects.envelope import (  # noqa: F401
    am_demod,
    default_envelope_fir,
    envelope,
    hilbert_envelope,
)
from audiosignalprocess_tpu.effects.noise_gate import gate_mask, noise_gate  # noqa: F401
from audiosignalprocess_tpu.effects.phase_vocoder import (  # noqa: F401
    pitch_shift,
    stretch_spec,
    time_stretch,
)
