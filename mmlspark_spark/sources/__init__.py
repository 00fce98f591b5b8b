"""Sources/sinks: binary files, images, and image transforms.

Parity: reference ``core/.../io/binary/BinaryFileFormat.scala``,
``BinaryFileReader.scala``, ``PatchedImageFileFormat.scala``,
``core/.../image/UnrollImage.scala``, ``ResizeImageTransformer.scala``,
``opencv/.../ImageTransformer.scala``, ``ImageSetAugmenter.scala``.
"""

from mmlspark_spark.sources.binary import (
    BINARY_FILE_SCHEMA,
    read_binary_files,
    zip_expand,
)
from mmlspark_spark.sources.image import (
    IMAGE_SCHEMA,
    DecodeImage,
    read_images,
)
from mmlspark_spark.sources.transforms import (
    ImageSetAugmenter,
    ImageTransformer,
    ResizeImageTransformer,
    UnrollImage,
)
from mmlspark_spark.sources.warc import (
    WARC_SCHEMA,
    read_warc,
    read_warc_stream,
    write_warc,
)

__all__ = [
    "BINARY_FILE_SCHEMA", "read_binary_files", "zip_expand",
    "IMAGE_SCHEMA", "read_images", "DecodeImage",
    "ImageTransformer", "ResizeImageTransformer", "UnrollImage",
    "ImageSetAugmenter",
    "WARC_SCHEMA", "read_warc", "read_warc_stream", "write_warc",
]
