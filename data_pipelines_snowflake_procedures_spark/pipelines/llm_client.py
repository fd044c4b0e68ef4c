"""Optional LLM client for the X5 generation hook (reference
``SNOWFLAKE.CORTEX.COMPLETE`` calls, Obj_Interpreter.sql:50-54,
Business_Glossory.sql:69-80, CODE_GENERATOR.sql prompt contracts).

The reference delegates text generation to a hosted model; this
package's default is deterministic templates (pipelines/codegen.py —
tests must never need a model). This module closes the capability gap
with a concrete, OPTIONAL client for any OpenAI-compatible
chat-completions endpoint (a public API shape served by many hosted
and self-hosted inference stacks), built on stdlib ``urllib`` only.

Configuration is environment-keyed and never read at import time:

- ``LLM_API_BASE``  — endpoint base, e.g. ``https://api.example.com/v1``
- ``LLM_API_KEY``   — bearer token (optional for keyless local servers)
- ``LLM_MODEL``     — model name passed through verbatim

Usage::

    from data_pipelines_snowflake_procedures_spark.pipelines import codegen, llm_client
    llm = llm_client.from_env()          # None unless LLM_API_BASE is set
    codegen.generate_code(objective, metadata, llm=llm)

No test requires the environment variables; the one integration test
(tests/test_pipelines.py::test_llm_client_completes_live) skips unless
``LLM_API_BASE`` is present.
"""

from __future__ import annotations

import json
import os
import urllib.request
from collections.abc import Callable


def make_client(
    api_base: str,
    api_key: str | None = None,
    model: str = "default",
    timeout_sec: float = 60.0,
    temperature: float = 0.0,
) -> Callable[[str], str]:
    """Build an X5-shaped ``prompt -> completion`` callable against an
    OpenAI-compatible ``/chat/completions`` endpoint. Temperature 0 by
    default — generated pipeline code should be as reproducible as the
    endpoint allows."""

    url = api_base.rstrip("/") + "/chat/completions"

    def complete(prompt: str) -> str:
        body = json.dumps(
            {
                "model": model,
                "temperature": temperature,
                "messages": [{"role": "user", "content": prompt}],
            }
        ).encode("utf-8")
        headers = {"Content-Type": "application/json"}
        if api_key:
            headers["Authorization"] = f"Bearer {api_key}"
        req = urllib.request.Request(url, data=body, headers=headers)
        with urllib.request.urlopen(req, timeout=timeout_sec) as resp:
            payload = json.loads(resp.read().decode("utf-8"))
        return payload["choices"][0]["message"]["content"]

    return complete


def from_env() -> Callable[[str], str] | None:
    """The env-keyed entry point: a client when ``LLM_API_BASE`` is
    set, else ``None`` (callers fall back to deterministic templates —
    the package default)."""
    api_base = os.environ.get("LLM_API_BASE")
    if not api_base:
        return None
    return make_client(
        api_base,
        api_key=os.environ.get("LLM_API_KEY"),
        model=os.environ.get("LLM_MODEL", "default"),
    )
