"""Dataset-preparation CLIs: the reference's offline workflow steps.

``iisan-tpu-build-lmdb`` (build_lmdb.py) and ``iisan-tpu-build-caches``
(build_caches.py) cover the reference's image-LMDB and hidden-state-cache
build stages (Dataset/build_lmdb.py, Code_Cached/preprocess_vectors.py and
the Versa preprocess_* family), so an installed package runs the full
preprocess -> LMDB -> caches -> train -> serve pipeline with no repo
checkout.
"""
