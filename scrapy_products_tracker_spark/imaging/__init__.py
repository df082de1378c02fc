from .codec import decode_image, dhash64, encode_image, phash64, psnr
from .dataset import (
    DEFAULT_ASPECT_BUCKETS,
    aspect_bucket_assign,
    caption_blocklist_filter,
    caption_frequency_filter,
    curate,
    laion_filter,
    pack_shards,
)
from .headers import header_integrity_flags, png_header_dims
from .metadata import (
    inject_metadata,
    scrub_image_metadata,
    strip_image_metadata,
    strip_jpeg_metadata,
    strip_png_metadata,
)
from .patches import patch_hash_table, patch_hashes, patch_overlap_pairs
from .quality import image_quality_stats, quality_metrics
from .media import (
    audio_stats,
    phash_audit,
    decode_audio,
    encode_audio,
    encode_video,
    iter_video_frames,
    resize_images,
    resize_nearest,
    sample_frames,
)
from .neardup import (
    image_caption_dedup,
    image_dedup_survivors,
    phash_band_cols,
    phash_neardup_pairs,
)
from .png import decode_png, encode_png
from .wds import read_wds_shards, write_wds_shards

__all__ = [
    "DEFAULT_ASPECT_BUCKETS",
    "aspect_bucket_assign",
    "caption_blocklist_filter",
    "caption_frequency_filter",
    "curate",
    "header_integrity_flags",
    "image_quality_stats",
    "quality_metrics",
    "laion_filter",
    "pack_shards",
    "phash_audit",
    "png_header_dims",
    "decode_image",
    "encode_image",
    "dhash64",
    "phash64",
    "psnr",
    "decode_png",
    "encode_png",
    "read_wds_shards",
    "write_wds_shards",
    "image_caption_dedup",
    "image_dedup_survivors",
    "phash_band_cols",
    "phash_neardup_pairs",
    "audio_stats",
    "decode_audio",
    "encode_audio",
    "encode_video",
    "iter_video_frames",
    "resize_images",
    "resize_nearest",
    "sample_frames",
    "inject_metadata",
    "scrub_image_metadata",
    "strip_image_metadata",
    "strip_jpeg_metadata",
    "strip_png_metadata",
]
