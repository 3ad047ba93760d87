from passt_tpu.data.prepare.pack_hdf5 import pack_waveform_hdf5, pack_bytes_hdf5

__all__ = ["pack_waveform_hdf5", "pack_bytes_hdf5"]
