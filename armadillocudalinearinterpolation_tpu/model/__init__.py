"""Model layer: lift / evolve / restrict pipeline of the event-driven map."""
