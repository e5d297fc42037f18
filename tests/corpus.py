"""Shared fuzz corpus for tokenizer parity tests (python/HF/native).

Input classes follow the reference's golden tests
(examples/test_tokenizer.cpp:70-73): accents, CJK, code, contractions,
messy whitespace.
"""

REFERENCE_INPUTS = [
    "Québec",
    "syömme \t  täällä    tänään",
    "I'm going to the store to buy 3 apples and a banana! You're welcome to "
    "come along if you'd like. The time is 2:30 p.m. and it's partly cloudy "
    "outside. I'll be back soon, so don't go anywhere.",
    '"5 2 + 3 * 4 -"; int stack[1000], top = -1; int calculate(int a, int b, '
    "char operator) { return operator == '+' ? a + b : operator == '-' ? a - "
    "b : operator == '*' ? a * b : a / b; }",
]

FUZZ_CORPUS = REFERENCE_INPUTS + [
    "",
    " ",
    "hello world",
    "HELLO WORLD",
    "ÀÉÎÕÜ àéîõü çñß",
    "日本語のテキスト and English 中文文本",
    "你好世界",
    "don't can't won't it's I'll you're we've they'd",
    "  leading and trailing   ",
    "tabs\tand\nnewlines\r\nmixed",
    "email@example.com http://foo.bar/baz?q=1&r=2",
    "3.14159 -42 1e10 0x1F",
    "ALLCAPS MixedCase lowercase",
    "a" * 150,  # exceeds max_input_chars_per_word -> UNK
    "word " + "b" * 101 + " word",
    "emoji 😀 and symbols ©®™",
    "Ḽơᶉëᶆ ȋṕšᶙṁ ḍỡḽǭᵳ ʂǐť ӓṁệẗ",
    "«quoted» “smart quotes” ‘single’",
    "half-width ｶﾀｶﾅ and ３ full-width",
    '\x00null\x00bytes',
    "combining á é marks",
]
