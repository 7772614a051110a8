"""ocr_platform_ray — a Ray-Data-native extraction engine.

A from-scratch re-expression of the capabilities of the reference OCR
platform (binhntt2020/OCR-platform: FastAPI + Celery + MinIO + Postgres,
``libs/ocr_core`` preprocess -> CRAFT detect -> VietOCR recognize ->
postprocess) as a streaming ``ray.data.Dataset`` pipeline over tables of
interleaved text + media documents:

    (doc_id: string,
     spans: list<struct<kind:string, text:string, media_ref:string, offset:int32>>)

Image spans are decoded (deterministic synthetic renderer — the sandbox has
no torch/PIL/cv2), text-detected (projection-profile box proposals standing
in for CRAFT, reduced with the reference's exact polygon->box arithmetic),
reading-order sorted, and recognized (bitmap-glyph template decode standing
in for VietOCR, replicating its tall-crop strip arithmetic exactly:
MAX_SINGLE_LINE_HEIGHT=56, LINE_STRIP_HEIGHT=32, LINE_STRIP_OVERLAP=4,
min strip 8 px — /root/reference/libs/ocr_core/ocr_core/engines/
vietocr_engine.py:14-16,63-100). Native text spans pass through a
boilerplate-strip/normalize stage. Recognized blocks are merged back with
the native text spans by offset and re-emitted as an ordered span sequence.

Conformance contract: per-row span-sequence equality
``(kind, text, media_ref, order)`` against ``ocr_platform_ray.oracle``,
a single-process pure-python/numpy implementation of the same semantics.
"""

__version__ = "0.1.0"
