"""S3 checkpoint fetch (parity: reference ``utils/s3_utils.py:5-11``).

boto3 is optional in TPU images; import is deferred so local-path flows never
touch it.
"""

from __future__ import annotations

import io


def load_checkpoint_from_s3(bucket_name: str, s3_file_key: str):
    """Download ``s3://bucket/key`` and torch.load it from memory."""
    import boto3
    import torch

    s3 = boto3.client("s3")
    buffer = io.BytesIO()
    s3.download_fileobj(bucket_name, s3_file_key, buffer)
    buffer.seek(0)
    return torch.load(buffer, map_location="cpu")
