"""Tokenizer layer: HF wrapper + a dependency-free byte tokenizer for tests.

The byte tokenizer gives deterministic, weight-free CPU tests (the
reference's test strategy fakes everything heavy — SURVEY.md §4); the HF
wrapper serves real checkpoints, including chat templates
(`LLM.chat` parity: reference `src/performance_enhancement/test_performance.py:155`).
"""

from __future__ import annotations


class ByteTokenizer:
    """Vocab = 256 raw bytes + BOS(256) + EOS(257). Lossless on any UTF-8."""

    vocab_size = 258
    bos_token_id = 256
    eos_token_id = 257

    def encode(self, text: str) -> list[int]:
        return list(text.encode("utf-8"))

    def decode(self, ids, skip_special_tokens: bool = True) -> str:
        data = bytes(i for i in ids if 0 <= i < 256)
        return data.decode("utf-8", errors="replace")

    def apply_chat_template(self, messages, add_generation_prompt=True, **kw):
        text = "".join(f"<{m['role']}>{m['content']}" for m in messages)
        if add_generation_prompt:
            text += "<assistant>"
        return self.encode(text)


class HFTokenizer:
    """Thin wrapper over transformers.AutoTokenizer."""

    def __init__(self, path: str):
        from transformers import AutoTokenizer

        self._tok = AutoTokenizer.from_pretrained(path, trust_remote_code=False)
        self.vocab_size = len(self._tok)
        self.eos_token_id = self._tok.eos_token_id
        self.bos_token_id = self._tok.bos_token_id

    def encode(self, text: str) -> list[int]:
        return self._tok.encode(text, add_special_tokens=True)

    def decode(self, ids, skip_special_tokens: bool = True) -> str:
        return self._tok.decode(ids, skip_special_tokens=skip_special_tokens)

    def apply_chat_template(self, messages, add_generation_prompt=True, **kw):
        return self._tok.apply_chat_template(
            messages, add_generation_prompt=add_generation_prompt, tokenize=True, **kw
        )


def get_tokenizer(path: str | None):
    if path is None:
        return ByteTokenizer()
    return HFTokenizer(path)


class IncrementalDetokenizer:
    """Streaming-safe incremental detokenization.

    Decodes with a sliding (prefix_offset, read_offset) window and holds
    back text while the tail still ends in an invalid/replacement char —
    the standard trick for BPE tokenizers whose tokens split multi-byte
    characters. One instance per request
    (reference capability: per-request incremental detokenizer,
    `src/doc/engine_core.md:412-475`).
    """

    def __init__(self, tokenizer, prompt_token_ids: list[int]):
        self.tokenizer = tokenizer
        # seed with the prompt tail so the first output tokens decode in
        # context (BPE pieces join with preceding text: leading-space and
        # multi-byte handling differ when decoded in isolation)
        ctx = list(prompt_token_ids[-5:]) if prompt_token_ids else []
        self.token_ids: list[int] = ctx
        self.prefix_offset = 0
        self.read_offset = len(ctx)
        self.text = ""

    def update(self, new_token_ids: list[int]) -> str:
        """Append tokens; return newly finalized text (may be '')."""
        self.token_ids.extend(new_token_ids)
        tok = self.tokenizer
        prefix = tok.decode(
            self.token_ids[self.prefix_offset : self.read_offset]
        )
        full = tok.decode(self.token_ids[self.prefix_offset :])
        if full.endswith("�"):
            return ""  # mid-character: hold back
        new_text = full[len(prefix) :]
        self.prefix_offset = self.read_offset
        self.read_offset = len(self.token_ids)
        self.text += new_text
        return new_text
