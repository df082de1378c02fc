from .codec import decode_image, encode_image, phash64, psnr
from .neardup import phash_band_cols, phash_neardup_pairs
from .png import decode_png, encode_png

__all__ = [
    "decode_image",
    "encode_image",
    "phash64",
    "psnr",
    "decode_png",
    "encode_png",
    "phash_band_cols",
    "phash_neardup_pairs",
]
