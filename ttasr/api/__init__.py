"""HTTP/WS product surface.

aiohttp-based replacement for the reference FastAPI stack (api/app.py,
api/file_asr.py, api/auth_api.py, api/streaming_asr.py): same routes,
status codes, payload shapes and env vars; JWT and pbkdf2_sha256 are
stdlib implementations (PyJWT/passlib are not in this image).
"""
