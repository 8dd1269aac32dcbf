from audiosignalprocess_tpu.utils.checkpoint import load_carry, save_carry  # noqa: F401
from audiosignalprocess_tpu.utils.metrics import snr_db  # noqa: F401
