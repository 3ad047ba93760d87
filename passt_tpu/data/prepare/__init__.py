from passt_tpu.data.prepare.pack_hdf5 import (
    StreamingPacker,
    pack_bytes_hdf5,
    pack_waveform_hdf5,
)

__all__ = ["StreamingPacker", "pack_waveform_hdf5", "pack_bytes_hdf5"]
