from audiosignalprocess_tpu.parallel.halo import (  # noqa: F401
    halo_left,
    halo_right,
    send_right_add,
)
from audiosignalprocess_tpu.parallel.mesh import (  # noqa: F401
    audio_sharding,
    make_mesh,
    shard_audio,
)
from audiosignalprocess_tpu.parallel.sharded import (  # noqa: F401
    channel_sharding,
    sharded_chain,
    sharded_fir,
    sharded_noise_gate,
    sharded_overlap_save,
    sharded_resample,
)
