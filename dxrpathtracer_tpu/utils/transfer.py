"""Device<->host transfer utilities.

The tunneled TPU intermittently hangs or faults on large single device->host
reads of computed buffers; chunked reads of a few MB are reliable. This is the
readback-engine counterpart of the reference's ReadbackBuffer path
(Graphics/DX12_Upload.cpp) — theirs exists for D3D12 heap mechanics, ours for
tunnel robustness.
"""

import numpy as np

CHUNK_BYTES = 6 * 1024 * 1024


def device_to_host(arr, chunk_bytes: int = CHUNK_BYTES) -> np.ndarray:
    """Read a device array back to numpy in row chunks along axis 0."""
    shape = arr.shape
    if len(shape) == 0:
        return np.asarray(arr)
    itemsize = np.dtype(arr.dtype).itemsize
    row_bytes = itemsize * int(np.prod(shape[1:])) if len(shape) > 1 else itemsize
    rows_per = max(int(chunk_bytes // max(row_bytes, 1)), 1)
    if rows_per >= shape[0]:
        return np.asarray(arr)
    out = np.empty(shape, np.dtype(arr.dtype))
    for r0 in range(0, shape[0], rows_per):
        out[r0:r0 + rows_per] = np.asarray(arr[r0:r0 + rows_per])
    return out
