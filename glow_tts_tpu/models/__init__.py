"""Model components: encoder, flow decoder, conditioning encoders, top model."""
