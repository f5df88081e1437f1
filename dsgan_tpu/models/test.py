"""TestModel — inference-only wrapper (reference DSGAN/models/test_model.py):
loads only the generator, forces the single-image A-side dataset."""

from dsgan_tpu.models.pix2pix import Pix2PixModel


class TestModel(Pix2PixModel):
    def name(self):
        return "TestModel"

    @staticmethod
    def modify_commandline_options(parser, is_train=True):
        assert not is_train, "TestModel cannot be used in train mode"
        parser = Pix2PixModel.modify_commandline_options(parser, is_train=False)
        parser.set_defaults(dataset_mode="single")
        parser.add_argument(
            "--model_suffix", type=str, default="",
            help="parity flag from the reference test model (unused)",
        )
        return parser

    def initialize(self, opt):
        assert not opt.isTrain
        Pix2PixModel.initialize(self, opt)
        self.visual_names = ["real_A", "fake_B"]

    def set_input(self, input):
        self.real_A = self._place_batch(input["A"])
        self.image_paths = input.get("A_paths", [])
