"""Third-person narrator demo (HTM-AA checkpoint convention).

The reference's demo_narrator_3rd_person.py differs from demo_narrator.py
only in the default model/checkpoint and crop convention
(reference demo_narrator_3rd_person.py vs demo_narrator.py — diff shows
only model/ckpt/crop changes); this delegates accordingly.
"""

from cli.demo_narrator import get_args_parser, main


def get_args():
    p = get_args_parser()
    p.set_defaults(third_person=True,
                   model="VCLM_OPENAI_TIMESFORMER_MINI_GPT2_MINI")
    return p


if __name__ == "__main__":
    main(get_args().parse_args())
