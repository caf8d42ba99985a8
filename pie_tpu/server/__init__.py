"""OpenAI-compatible HTTP serving layer (aiohttp).

Reference parity: src/proxy_inference_engine/server/ — FastAPI app with
/v1/completions, /v1/chat/completions (+SSE streaming, logprobs),
/v1/responses. Rebuilt on aiohttp with the same wire schemas (public
OpenAI API shapes).
"""

from pie_tpu.server.app import create_app
