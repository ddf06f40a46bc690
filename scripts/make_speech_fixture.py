"""Generate the committed speech fixture corpus (tests/fixtures/speech/).

The environment has zero network egress, so no recorded human speech can be
fetched; these fixtures are *synthesized* speech — a source-filter (glottal
pulse train -> formant resonator cascade) vowel synthesizer plus fricative
noise — i.e. phonetically structured audio with a real acoustic-to-text
correspondence, stored as real on-disk WAV and FLAC files. They stand in for
the reference CI's AN4 recordings (`/root/reference/Jenkinsfile:307-325`) in
the end-to-end user-journey test (tests/test_real_audio_e2e.py).

Deterministic: re-running this script reproduces the committed bytes.
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SR = 16000

# F1/F2/F3 (Hz) per vowel (Peterson & Barney averages)
FORMANTS = {
    "a": (730, 1090, 2440),
    "e": (530, 1840, 2480),
    "i": (270, 2290, 3010),
    "o": (570, 840, 2410),
    "u": (300, 870, 2240),
}


def _resonator(x, f, bw, sr=SR):
    """2nd-order all-pole resonance at f Hz with ~bw Hz bandwidth."""
    r = np.exp(-np.pi * bw / sr)
    a1, a2 = 2 * r * np.cos(2 * np.pi * f / sr), -(r * r)
    y = np.zeros_like(x)
    y1 = y2 = 0.0
    for n in range(len(x)):
        y[n] = x[n] + a1 * y1 + a2 * y2
        y1, y2 = y[n], y1
    return y


def synth_phone(ch, rng, f0=115.0, dur=0.14):
    n = int(dur * SR)
    if ch == " ":
        return np.zeros(int(0.08 * SR), np.float32)
    if ch == "s":
        noise = rng.randn(n).astype(np.float64)
        # crude high-pass: difference filter applied twice
        hp = np.diff(np.diff(noise, prepend=0.0), prepend=0.0)
        out = hp * 0.15
    else:
        f1, f2, f3 = FORMANTS[ch]
        # glottal source: impulse train with slight jitter + decaying pulse
        src = np.zeros(n)
        period = int(SR / f0)
        for i in range(0, n, period):
            j = i + rng.randint(-2, 3)
            if 0 <= j < n:
                src[j] = 1.0
        src = np.convolve(src, np.exp(-np.arange(40) / 8.0), mode="same")
        out = (_resonator(src, f1, 60) * 1.0
               + _resonator(src, f2, 90) * 0.5
               + _resonator(src, f3, 120) * 0.25)
    # onset/offset ramps to avoid clicks
    ramp = min(len(out) // 4, 160)
    env = np.ones(len(out))
    env[:ramp] = np.linspace(0, 1, ramp)
    env[-ramp:] = np.linspace(1, 0, ramp)
    out = out * env
    return (out / (np.abs(out).max() + 1e-9) * 0.4).astype(np.float32)


def synth_utterance(text, seed):
    rng = np.random.RandomState(seed)
    parts = [np.zeros(int(0.05 * SR), np.float32)]
    for ch in text:
        parts.append(synth_phone(ch, rng))
    parts.append(np.zeros(int(0.05 * SR), np.float32))
    return np.concatenate(parts)


TEXTS = ["ia ue", "sos isi", "aeo", "uso ea", "si su", "oia es"]


def main():
    from conformer_nemo_tpu.data.audio_io import write_wav
    from conformer_nemo_tpu.data.flac_encode import write_flac

    root = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "tests", "fixtures", "speech")
    os.makedirs(root, exist_ok=True)
    entries = []
    for i, text in enumerate(TEXTS):
        wav = synth_utterance(text, seed=1000 + i)
        name = f"utt{i}.flac" if i % 2 else f"utt{i}.wav"
        path = os.path.join(root, name)
        if name.endswith(".flac"):
            write_flac(path, wav, SR)
        else:
            write_wav(path, wav, SR)
        entries.append({"audio_filepath": name,  # relative; tests absolutize
                        "duration": round(len(wav) / SR, 3), "text": text})
    with open(os.path.join(root, "manifest.json"), "w") as f:
        for e in entries:
            f.write(json.dumps(e) + "\n")
    print(f"wrote {len(entries)} utterances to {root}")


if __name__ == "__main__":
    main()
