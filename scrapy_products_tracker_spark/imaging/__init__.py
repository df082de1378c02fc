from .codec import decode_image, encode_image, phash64, psnr
from .png import decode_png, encode_png

__all__ = ["decode_image", "encode_image", "phash64", "psnr", "decode_png", "encode_png"]
