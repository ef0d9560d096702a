"""clearcam_tpu — a TPU-native smart-NVR framework.

Re-architecture of roryclear/clearcam (tinygrad, single-GPU) as a JAX/XLA/Pallas
pipeline: fused letterbox+detect+NMS graphs on TPU, cross-stream batching over a
device mesh, vectorized OC-SORT tracking, CLIP/face embedding search, and a
GGUF-loading LLM runtime for Qwen3-VL event summaries.

Layer map (bottom-up):
  io/        weight formats (safetensors, GGUF + dequant)
  nn/        functional NHWC layers on jax.numpy
  ops/       image preprocarch + box decode + on-device NMS
  models/    YOLOv9, OpenCLIP, BlazeFace, AdaFace, LLM, Qwen3-VL
  track/     vectorized OC-SORT (SoA Kalman slots)
  parallel/  mesh/sharding helpers (dp over streams, tp on towers)
  runtime/   NVR core: ingest, batched detect step, alerts, storage
  server/    HTTP API (:8080) + web UI
  cloud/     encrypted event-clip relay (AES-CBC), notifications
  utils/     SQLite KV store, tokenizers
"""

__version__ = "0.1.0"
